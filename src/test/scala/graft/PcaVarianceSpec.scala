package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** p21_pca has no SQL oracle (eigenvector signs and low-order bits depend
  * on float accumulation order), so this pins its CONTRACT instead:
  * explained-variance ratios are ordered, positive, and bounded, and the
  * PCA basis beats the axis-aligned baseline it exists to beat —
  * projecting onto PC1 must capture at least as much variance as the best
  * single raw coordinate (PCA's defining optimality). A violation means
  * the loadings aren't eigenvectors of the covariance anymore.
  */
class PcaVarianceSpec extends SparkSpec {

  private lazy val (comps, ev) = Similarity.pcaFit(spark, sfDir)

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
