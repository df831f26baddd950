package graft

import graft.operators.Dedup

/** dd_corpus_report's pair counts are computed BY IDENTITY from the
  * compact cached frames (Σ C(n,2) within groups + Σ n_a·n_b across
  * verified edges) so the dashboard never streams the quadratic
  * doc-pair expansion. These differentials pin the identity against
  * count(*) over the expanded gate operators on the real corpus —
  * if a blocker/verify change ever breaks the closed form, this is
  * the spec that says so. */
class PairCountSpec extends SparkSpec {

  test("minhash pair count by identity equals the expanded stream") {
    val expanded = Dedup.ddMinhashLsh(spark, sfDir).count()
    val closed = Dedup.minhashPairCount(spark, sfDir).head().getLong(0)
    assert(closed == expanded, s"closed=$closed expanded=$expanded")
  }

  test("simhash pair count by identity equals the expanded stream") {
    val expanded = Dedup.ddSimhash(spark, sfDir).count()
    val closed = Dedup.simhashPairCount(spark, sfDir).head().getLong(0)
    assert(closed == expanded, s"closed=$closed expanded=$expanded")
  }
}
