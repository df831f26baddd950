package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions
import graft.operators.TextOps

/** Differential guard for the r17 tx_contamination replica collapse:
  * the operator shingles DISTINCT texts only and expands (doc, bench)
  * pairs afterwards — this spec pins that it emits EXACTLY the pairs
  * the naive per-document formulation does, on a corpus built to
  * stress the collapse edges: replica groups straddling the benchmark
  * split (the same text with copies on both sides), bench-only and
  * corpus-only replica groups, a partial-overlap pair, unique docs,
  * empty-text duplicates, and a short (< ContamN tokens) duplicate.
  * The naive reference recomputes shingle-set intersections on the
  * driver with the SAME native kernel the operator uses.
  */
class ContamCollapseSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("contam_test").toString
    val M = TextOps.BenchMod // 97: doc_id % M == 0 → benchmark side
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = "alpha bravo charlie delta echo foxtrot golf hotel india kilo" // shares a's 5-gram prefix run
    val c = "completely different words about catalyst optimizer internals and shuffle behavior"
    val docs = Seq(
      (0L, a), (1L, a), (2L, a),     // replica group straddling the split (0 is bench)
      (M, b), (M + 1L, b),           // second straddling group (97 bench, 98 corpus)
      (3L, b),                       // more corpus copies of b
      (4L, c), (2 * M, c),           // unique-content pair across the split
      (5L, "corpus only text never shared with any benchmark document here"),
      (3 * M, "bench only text never shared with any training document here"),
      (6L, ""), (4 * M, ""),         // empty-text duplicates across the split
      (7L, "tiny dup"), (5 * M, "tiny dup")) // < ContamN tokens → whole-doc shingle
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Naive per-document reference: shingle EVERY doc with the operator's
    * kernel, intersect on the driver. */
  private def naive(dir: String): Set[(Long, Long, Long)] = {
    val shOf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        NativeExpressions.wordShingles(col("text"), TextOps.ContamN).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val ids = shOf.keys.toSeq
    (for {
      c <- ids if c % TextOps.BenchMod != 0
      b <- ids if b % TextOps.BenchMod == 0
      n = (shOf(c) & shOf(b)).size.toLong if n > 0
    } yield (c, b, n)).toSet
  }

  test("collapsed tx_contamination equals the per-document form on a replica-dense fixture") {
    val got = TextOps.txContamination(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == got.sortBy(p => (p._1, p._2)).toSeq,
      "output lost the (doc_id, bench_id) order")
    assert(got.length == got.toSet.size, "a (doc, bench) pair was emitted twice")
    val want = naive(dir)
    assert(got.toSet == want,
      s"pairs drifted: got ${got.toSeq.sorted}, naive ${want.toSeq.sorted}")
    // the fixture exercises the collapse edges
    assert(got.toSet.contains((1L, 0L, 6L)) || got.toSet.exists(p => p._1 == 1L && p._2 == 0L),
      "straddling replica group produced no cross-split pair")
    assert(got.toSet.exists(p => p._1 == 6L), "empty-text duplicates missing")
    assert(got.toSet.exists(p => p._1 == 7L), "short-text duplicates missing")
  }

  test("collapsed tx_contamination equals the per-document form on the real table") {
    val got = TextOps.txContamination(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size)
    assert(got.toSet == naive(sfDir))
    assert(got.nonEmpty, "fixture produced no pairs — differential is vacuous")
  }
}
