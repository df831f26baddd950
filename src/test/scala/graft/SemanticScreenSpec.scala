package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The dd_semantic kernel's exactness contract: the per-cluster native
  * pair scan ([[graft.functions.Kernels.semanticVerdicts]]) must produce
  * a verdict table BIT-IDENTICAL to the naive all-within-cluster exact
  * scan — on the real corpus AND on a fixture built to sit exactly
  * where a threshold re-expression could break: cosines just above and
  * below the 0.35 threshold (the round-half-up boundary the kernel
  * re-expresses as `cos·10⁶ ≥ thr − 0.5`), components past ±1, a zero
  * vector and a NaN-poisoned vector (the kernel's DEFINED semantics:
  * NaN cosine is never a duplicate, the row survives).
  */
class SemanticScreenSpec extends SparkSpec {
  import spark.implicits._

  /** Naive exact truth: within-cluster pairwise cosine in plain Scala. */
  private def naive(vs: Seq[(Long, Seq[Double], Long)]): Map[Long, (Long, Long)] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val dups = for {
      (ia, va, ca) <- vs
      (ib, vb, cb) <- vs
      if ca == cb && ia < ib
      c = math.round(cos(va, vb) * 1000000)
      if c >= Similarity.SemanticThresholdPpm
    } yield (ia, ib)
    vs.map { case (id, _, _) =>
      val partners = dups.collect {
        case (a, b) if a == id => b
        case (a, b) if b == id => a
      }
      id -> (partners.size.toLong,
        if (partners.exists(_ < id)) 0L else 1L)
    }.toMap
  }

  private def run(vs: Seq[(Long, Seq[Double], Long)]): Map[Long, (Long, Long)] = {
    val v = vs.map { case (id, vec, _) => (id, vec) }.toDF("vec_id", "v")
    val asg = vs.map { case (id, _, c) => (id, c) }.toDF("vec_id", "cluster")
    Similarity.semanticVerdict(v, asg)
      .select("vec_id", "n_dups", "is_kept")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
  }

  private def pad(xs: Double*): Seq[Double] = xs ++ Seq.fill(8 - xs.size)(0.0)
  // cos(u(t), u(0)) = cos(t); 0.35 ≈ cos(1.21323). Angles bracket the
  // threshold tightly on both sides, at magnitudes 1 and >1.
  private def u(theta: Double, m: Double): Seq[Double] =
    pad(m * math.cos(theta), m * math.sin(theta))

  test("kernel ≡ naive on adversarial magnitudes and threshold edges") {
    val fixture = Seq(
      (0L, u(0.0, 1.0), 0L),
      (1L, u(1.2130, 1.0), 0L),   // cos ≈ 0.35002 → dup with 0
      (2L, u(1.2135, 1.0), 0L),   // cos ≈ 0.34961 → NOT a dup with 0
      (3L, u(0.0, 1.9), 0L),      // parallel to 0 at magnitude 1.9 → cos 1
      (4L, u(1.2130, 2.4), 0L),   // past-±1 components, just-above pair
      (5L, pad(0.0), 0L),         // zero vector: NaN cosine → never a dup
      (6L, pad(Double.NaN, 0.3), 0L), // NaN vector: never a dup, kept
      (7L, u(0.3, 1.0), 1L),      // other cluster: never paired with 0-6
      (8L, u(0.3, 1.0), 1L))
    // rows 5/6 pin the kernel's DEFINED NaN semantics (cos NaN ⇒ not a
    // duplicate, row survives) — the r13 join form crashed on the ANSI
    // NaN→long cast here; the naive Scala reference (math.round(NaN)=0)
    // agrees with the kernel's `NaN >= t is false`.
    assert(run(fixture) == naive(fixture))
    assert(run(fixture)(5L) == (0L, 1L) && run(fixture)(6L) == (0L, 1L))
  }

  test("screen ≡ naive on the real sf0.001 corpus") {
    val vs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val asg = Similarity.lloydsAssign(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val fixture = vs.toSeq.map { case (id, v) => (id, v, asg(id)) }
    assert(run(fixture) == naive(fixture))
  }

  test("row-set contract: an assignment row without a vector row is dropped") {
    // semanticVerdict's join is INNER by contract (scaladoc at the
    // seam): callers must pass same-coverage frames. The pre-r14
    // left-join form emitted the orphan as n_dups=0/is_kept=1 — this
    // pin makes the changed semantics a conscious decision a future
    // caller sees fail, not a silent drop.
    val v = Seq((1L, pad(1.0)), (2L, pad(1.0))).toDF("vec_id", "v")
    val asg = Seq((1L, 0L), (2L, 0L), (99L, 0L)).toDF("vec_id", "cluster")
    val ids = Similarity.semanticVerdict(v, asg)
      .select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }
}
