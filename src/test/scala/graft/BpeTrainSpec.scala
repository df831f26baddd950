package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.TextOps

/** Pins tx_bpe_train's contract: (1) on a corpus engineered from the
  * embedded table's tier-1 bigrams, training REPRODUCES the embedded
  * table's shape and applying the learned table through the replace
  * chain (the formulation BpeSpec pins the kernel against) fully
  * compresses each vocabulary word; (2) the lexicographic tie-break;
  * (3) classic overlap counting ("aaa" counts (a,a) twice) and the
  * left-to-right non-overlapping merge. The oracle gate covers the
  * full unrolled-CTE equivalence on the real table.
  */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(dir: String, texts: Seq[String]): String = {
    texts.zipWithIndex.map { case (t, i) => (i.toLong + 1L, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("reproduces the embedded table's tier-1 shape; learned table compresses via the replace chain") {
    // One word per embedded tier-1 rule, frequency strictly descending
    // in rank: the r-th round must learn exactly rule r.
    val rules = Bpe.Merges.take(Bpe.TrainRounds) // all tier-1, single chars
    val words = rules.map { case (p, q) => p + q }
    assert(words.distinct.size == words.size)
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(100 - i)(w) }.mkString(" ")
    val dir = writeDocs(
      java.nio.file.Files.createTempDirectory("bpetrain1").toString, Seq(text))
    val learned = TextOps.txBpeTrain(spark, dir)
      .select("rank", "p", "q", "pair_count")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(learned.map(r => (r._2, r._3)) == rules,
      s"learned ${learned.map(r => (r._2, r._3))} != embedded prefix $rules")
    assert(learned.map(_._4) == (0 until words.size).map(100L - _),
      "pair_count must be the word frequency (one pair per 2-char word)")
    // the learned table, applied through the oracle-pinned replace
    // chain, fully compresses every vocabulary word to ONE token
    val table = learned.map(r => (r._2, r._3))
    words.foreach { w =>
      assert(Bpe.tokenCountViaReplaceChain(w, table) == 1,
        s"word $w should encode to 1 token under the learned table")
    }
  }

  test("frequency ties break lexicographically on (p, q)") {
    val dir = writeDocs(
      java.nio.file.Files.createTempDirectory("bpetrain2").toString,
      Seq("dc ba dc ba")) // (b,a) and (d,c) both count 2
    val first = TextOps.bpeTrain(spark, dir, 1)
      .select("p", "q").as[(String, String)].head()
    assert(first == (("b", "a")))
  }

  test("overlap counting and left-to-right merge on a run") {
    // "aaa": round 1 counts (a,a) twice (all adjacent pairs) but merges
    // non-overlapping -> [aa][a]; round 2 learns (aa, a) with count 1.
    val dir = writeDocs(
      java.nio.file.Files.createTempDirectory("bpetrain3").toString,
      Seq("aaa"))
    val rows = TextOps.bpeTrain(spark, dir, 2)
      .select("rank", "p", "q", "merged", "pair_count")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(rows == Seq((1L, "a", "a", "aa", 2L), (2L, "aa", "a", "aaa", 1L)))
  }

  test("learned tables satisfy the creation-order invariant on the real corpus") {
    // Bpe's in-order fast encoder is equivalent to lowest-rank-first
    // ONLY for tables where each rule's sides are single chars or
    // products of strictly earlier rules — true of any table the BPE
    // procedure actually learns. Pin that the trainer's output has the
    // property, so a learned table can always be fed to the tx_bpe
    // kernel.
    val learned = TextOps.txBpeTrain(spark, sfDir)
      .select("rank", "p", "q").as[(Long, String, String)].collect()
      .sortBy(_._1)
    val products = scala.collection.mutable.Set[String]()
    learned.foreach { case (rank, p, q) =>
      assert(p.length == 1 || products.contains(p),
        s"rank $rank left side '$p' is neither a char nor an earlier product")
      assert(q.length == 1 || products.contains(q),
        s"rank $rank right side '$q' is neither a char nor an earlier product")
      products += (p + q)
    }
    assert(learned.length == Bpe.TrainRounds)
  }

  test("word frequencies weight the pair counts across documents") {
    // "ab" appears in 3 docs, "cd" in 1 -> (a,b) must win round 1
    val dir = writeDocs(
      java.nio.file.Files.createTempDirectory("bpetrain4").toString,
      Seq("ab cd", "ab", "ab"))
    val first = TextOps.bpeTrain(spark, dir, 1)
      .select("p", "q", "pair_count").as[(String, String, Long)].head()
    assert(first == (("a", "b", 3L)))
  }
}
