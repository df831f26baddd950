package graft

import graft.operators.Similarity

/** p21_kmeans is the last rows-only gate without a quantitative pin:
  * MLlib's k-means|| init is seeded-random with no SQL form, so the
  * oracle can't hash it. Following IvfRecallSpec's pattern, this pins
  * the clustering's QUALITY against the hash-verified Lloyd's chain
  * (p21_lloyds trains the same k=10 at sf0.001 — 500 vectors, one seed
  * per 50) instead: sizes must partition the corpus, and the trained
  * inertia must sit in a band around the Lloyd's inertia. Deterministic
  * (seed 42, hash-sample training) — a drift means the operator changed
  * behavior, not flakiness.
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

  test("p21_kmeans inertia lands in a band around the hash-gated Lloyd's inertia") {
    val mllib = Similarity.kmeansInertia(spark, sfDir)
    val lloyds = Similarity.lloydsInertia(spark, sfDir)
    assert(mllib > 0 && lloyds > 0, s"non-positive inertia: mllib=$mllib lloyds=$lloyds")
    // 20-iteration k-means|| must not be WORSE than 3-iteration
    // every-50th-seed Lloyd's by more than 5%...
    assert(mllib <= lloyds * 1.05,
      s"MLlib inertia $mllib exceeds Lloyd's $lloyds by >5% — training regressed")
    // ...and can't be dramatically better either: same k on a
    // near-uniform corpus bounds how much 17 extra iterations buy
    // (measured ratio ~0.97 at sf0.001). A collapse below half the
    // Lloyd's inertia means one of the two sides changed corpus/scale.
    assert(mllib >= lloyds * 0.5,
      s"MLlib inertia $mllib below half of Lloyd's $lloyds — scale/corpus drift")
  }
}
