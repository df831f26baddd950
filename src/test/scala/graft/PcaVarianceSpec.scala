package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** p21_pca is hash-gated through the deterministic squaring fit
  * (Similarity.pcaDetFit); this spec pins the MATH behind that gate with
  * checks the DuckDB mirror can't provide: explained-variance ratios are
  * ordered, positive, and bounded, the PCA basis beats the axis-aligned
  * baseline it exists to beat (PCA's defining optimality), and — the
  * differential — the deterministic loadings agree with MLlib's
  * independent SVD-based fit up to sign, so the squaring solve is finding
  * real eigenvectors, not just a stable fixed point.
  */
class PcaVarianceSpec extends SparkSpec {

  private lazy val (comps, ev) = Similarity.pcaFit(spark, sfDir)
  private lazy val (detComps, detOffs) = Similarity.pcaDetFit(spark, sfDir)

  test("deterministic loadings match MLlib's SVD fit up to sign") {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    comps.zip(detComps).zipWithIndex.foreach { case ((ml, det), j) =>
      val c = math.abs(cos(ml, det.toSeq))
      assert(c > 0.999999, s"PC${j + 1}: |cos(mllib, det)| = $c")
    }
    assert(detOffs.forall(o => !o.isNaN && !o.isInfinite), s"bad offsets $detOffs")
  }

  test("deterministic loadings are unit-norm, orthogonal, sign-canonical") {
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    detComps.foreach { w =>
      assert(math.abs(dot(w, w) - 1.0) < 1e-9, "non-unit deterministic loading")
      val am = w.indices.maxBy(i => math.abs(w(i)))
      assert(w(am) > 0, "sign convention violated: largest component negative")
    }
    assert(math.abs(dot(detComps(0), detComps(1))) < 1e-9,
      "non-orthogonal deterministic loadings")
  }

  test("explained-variance ratios are ordered, positive, bounded") {
    assert(ev.length == Similarity.PcaK)
    assert(ev.forall(r => r > 0.0 && r < 1.0), s"ratios out of (0,1): $ev")
    assert(ev.head >= ev.last, s"PC1 ratio below PC2: $ev")
    assert(ev.sum <= 1.0 + 1e-9, s"ratios sum over 1: $ev")
  }

  test("loadings are unit-norm and orthogonal") {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    comps.foreach { w =>
      assert(math.abs(dot(w, w) - 1.0) < 1e-9, "non-unit loading")
    }
    assert(math.abs(dot(comps(0), comps(1))) < 1e-9, "non-orthogonal loadings")
  }

  test("PC1 captures at least the variance of the best raw axis") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    // per-axis variance of the raw coordinates
    val axisVar = emb
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(var_pop(col("x")).as("s2"))
      .agg(max(col("s2"))).head.getDouble(0)
    val w1 = array(comps.head.map(lit): _*)
    val pc1Var = emb
      .select(graft.functions.VectorFunctions.dot(col("v"), w1).as("p"))
      .agg(var_pop(col("p"))).head.getDouble(0)
    assert(pc1Var >= axisVar - 1e-9,
      s"PC1 variance $pc1Var below best raw axis $axisVar")
  }
}
