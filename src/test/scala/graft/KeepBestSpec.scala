package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** dd_keep_best contract: one keeper per component, the keeper is the
  * component's quality argmax (ties → smallest doc_id), and the rule
  * actually DIVERGES from dd_decisions' min-id rule when a
  * higher-quality member has a larger id — pinned on a constructed
  * near-dup pair the synthetic corpus may not contain (exact replicas
  * always tie on quality, so only near-dups can exercise the branch).
  */
class KeepBestSpec extends SparkSpec {

  test("keeper is the per-component quality argmax on the real corpus") {
    val rows = Dedup.ddKeepBest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // one keeper per component, and it is exactly max-(quality, -id)
    rows.groupBy(_._2).foreach { case (comp, members) =>
      val want = members.maxBy(m => (m._3, -m._1))._1
      val kept = members.filter(_._4 == 1L).map(_._1).toSeq
      assert(kept == Seq(want), s"component $comp kept $kept, want $want")
    }
    // same doc universe and component labels as dd_decisions
    val dec = Dedup.ddDecisions(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(t => (t._1, t._2)).toSet == dec)
  }

  test("a higher-quality near-dup with a LARGER id beats the min-id rule") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("keepbest_test").toString
    // b swaps one content word of a for stopwords ("is a"): simhash
    // stays within HammingMax (one token of 14 differs) while n_stops
    // rises -> higher stop_ppm -> higher quality_ppm for the LARGER id.
    val a = "the quick brown fox jumps over the lazy dog with extra tokens here now"
    val b = "the quick brown fox is a over the lazy dog with extra tokens here now"
    Seq((1L, a), (2L, b), (3L, "unrelated content about catalyst shuffles entirely"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // Precondition: the pair really is a simhash near-dup (else the
    // component machinery never groups them and this test proves nothing).
    val pairs = Dedup.ddSimhash(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      s"fixture drift: (1,2) not a simhash near-dup (pairs=$pairs) — adjust the word swap")

    val kb = Dedup.ddKeepBest(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(kb(1L)._1 == kb(2L)._1, "1 and 2 must share a component")
    assert(kb(2L)._2 > kb(1L)._2, "fixture drift: 2 must out-score 1 on quality")
    assert(kb(2L)._3 == 1L && kb(1L)._3 == 0L,
      s"keep-best must keep the higher-quality larger id: got $kb")
    // ...where dd_decisions keeps the min id — the rules genuinely diverge
    val dec = Dedup.ddDecisions(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dec(1L) == 1L && dec(2L) == 0L)
  }
}
