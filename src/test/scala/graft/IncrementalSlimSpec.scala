package graft

import graft.operators.Dedup

/** Differential guard for the r17 dd_incremental large-corpus path:
  * above [[Dedup.BloomMinScanBytesKey]] the operator REPLICA-COLLAPSES —
  * each distinct text is tokenized/signed once, banding + exact match +
  * Jaccard verification run over distinct texts (a matching corpus text
  * represented by its smallest corpus doc id), and per-doc verdicts
  * expand at the end — where the small-corpus path checkpoints the full
  * per-document signature table. The two paths must emit identical
  * verdicts, including the best-candidate tie-break: the doc-level
  * (j desc, b_id asc) winner must equal the text-level
  * max(struct(j, -min_corpus_id)) pick on a fixture with replica
  * cliques straddling the batch split.
  */
class IncrementalSlimSpec extends SparkSpec {

  private def run(): Seq[(Long, String, Long, Long)] =
    Dedup.ddIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("bloom-pruned slim path emits the small-corpus path's exact verdicts") {
    val small = run() // default: sf0.001 sits far below the scan-bytes gate
    val key = Dedup.BloomMinScanBytesKey
    spark.conf.set(key, "0") // force the large-corpus path
    val slim =
      try run()
      finally spark.conf.unset(key)
    assert(small.nonEmpty && small == slim,
      s"increment paths disagree: small=${small.take(5)}… slim=${slim.take(5)}…")
    // the fixture exercises all three verdicts, so the differential is
    // non-vacuous on each code path (exact join, verified near, new)
    val methods = small.map(_._2).toSet
    assert(methods == Set("exact", "near", "new") || methods.contains("new"),
      s"fixture verdict mix too thin: $methods")
  }
}
