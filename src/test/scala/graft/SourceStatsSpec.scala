package graft

import graft.operators.TextOps

/** tx_source_stats arithmetic on the real corpus: shares sum to ~1M ppm,
  * dup rate is consistent with dd_exact's fingerprint view, and token
  * mass reconciles with tx_tokens.
  */
class SourceStatsSpec extends SparkSpec {
  import spark.implicits._

  test("per-source rows reconcile with the corpus totals") {
    val rows = TextOps.txSourceStats(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(_._2).sum == docs.count())
    // shares: floor-div ppm per source → sum in (1M - |sources|, 1M]
    val share = rows.map(_._4).sum
    assert(share <= 1000000L && share > 1000000L - rows.size)
    // token mass equals the tx_tokens total
    val nt = TextOps.txTokens(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens")).head.getLong(0)
    assert(rows.map(_._3).sum == nt)
    rows.foreach { case (_, nDocs, _, _, nFp, dupPpm) =>
      assert(nFp >= 1L && nFp <= nDocs)
      assert(dupPpm == (nDocs - nFp) * 1000000L / nDocs)
    }
    // corpus-wide distinct fingerprints ≤ the per-source sum (a dup
    // whose copies span two sources counts once globally, once per
    // source here — dup_ppm is deliberately WITHIN-source)
    val globalFp = TextOps.txFingerprint(spark, sfDir)
      .select($"fp").distinct().count()
    assert(globalFp <= rows.map(_._5).sum)
  }
}
