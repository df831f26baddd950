package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Calibration gate for the verify-free estimator: dd_minhash_estimate's
  * signature-agreement Jaccard must track dd_minhash_lsh's exact verified
  * Jaccard on the pairs both emit. Everything here is deterministic
  * (md5-derived signatures, fixed corpus), so these are exact expected
  * properties at sf0.001, not statistical bounds — a drift means the
  * estimator or the shared banding changed behavior.
  */
class MinhashEstimateSpec extends SparkSpec {

  private lazy val est = Dedup.ddMinhashEstimate(spark, sfDir)
    .select(col("id_a"), col("id_b"), col("est_j_ppm"))
  private lazy val exact = Dedup.ddMinhashLsh(spark, sfDir)
    .select(col("id_a"), col("id_b"), col("j_ppm"))

  test("estimate covers every verified pair (same banding, no verify filter)") {
    // the verified operator's pairs are the estimate's candidates that
    // passed the exact-Jaccard threshold — banding is shared, so the
    // estimate table must contain them all
    assert(exact.join(est, Seq("id_a", "id_b"), "left_anti").isEmpty)
  }

  test("estimator tracks exact Jaccard within K-quantization on verified pairs") {
    // one matching signature = 1/K = 62500 ppm of resolution; the
    // estimator is unbiased with stderr sqrt(J(1-J)/K) — on this corpus
    // the worst deviation is a deterministic value well inside 4/K
    val dev = exact.join(est, Seq("id_a", "id_b"))
      .select(max(abs(col("est_j_ppm") - col("j_ppm")))).head.getLong(0)
    assert(dev <= 4 * 62500L, s"estimate deviates $dev ppm from exact Jaccard")
  }

  test("estimates are K-quantized and within [0, 1e6]") {
    val bad = est.filter(col("est_j_ppm") % 62500L =!= 0 ||
      col("est_j_ppm") < 0 || col("est_j_ppm") > 1000000L)
    assert(bad.isEmpty)
  }
}
