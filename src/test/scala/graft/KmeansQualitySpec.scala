package graft

import graft.operators.Similarity

/** p21_kmeans is hash-gated since round 10 (deterministic fixed-k
  * Lloyd's chain with a full DuckDB mirror); this spec keeps the
  * QUALITY-parity pin the reference's seeded sklearn training implies:
  * the deterministic chain must cluster about as tightly as MLlib's
  * k-means|| (seed 42, 20 iterations, hash-sample training) on the same
  * corpus — the [[Similarity.kmeansCentArr]] trainer retained for
  * exactly this comparison. Deterministic both sides — a drift means an
  * operator changed behavior, not flakiness.
  */
class KmeansQualitySpec extends SparkSpec {

  private lazy val corpusN = Tables.embeddings(spark, sfDir).count()

  test("p21_kmeans sizes partition the corpus across all 10 clusters") {
    val sizes = Similarity.p21Kmeans(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == corpusN,
      s"cluster sizes ${sizes.values.sum} != corpus $corpusN")
    assert(sizes.keySet == (0L until 10L).toSet,
      s"expected 10 non-empty clusters 0..9, got ${sizes.keySet.toSeq.sorted}")
  }

  test("p21_kmeans inertia lands in a band around the MLlib parity trainer") {
    val det = Similarity.detKmeansInertia(spark, sfDir)
    val mllib = Similarity.kmeansInertia(spark, sfDir)
    assert(det > 0 && mllib > 0, s"non-positive inertia: det=$det mllib=$mllib")
    // 3-iteration first-k-seeded Lloyd's must not be WORSE than MLlib's
    // 20-iteration k-means|| by more than 10% (measured ratio ~1.03 at
    // sf0.001 — the near-uniform sphere leaves little for 17 extra
    // iterations + smarter init to win)...
    assert(det <= mllib * 1.10,
      s"deterministic inertia $det exceeds MLlib $mllib by >10% — training regressed")
    // ...and can't be dramatically better either: same k on the same
    // corpus bounds the gap. A collapse below half the MLlib inertia
    // means one of the two sides changed corpus/scale.
    assert(det >= mllib * 0.5,
      s"deterministic inertia $det below half of MLlib $mllib — scale/corpus drift")
  }
}
