package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Pins the two properties that make tx_bm25 a RANKER rather than a hit
  * counter — rarity weighting (a rare query term outranks a common one
  * at equal tf and dl) and length normalization (equal tf in a longer
  * doc scores lower) — plus tx_tfidf picking the rare term as a doc's
  * keyword. The oracle gate covers the arithmetic on the real corpus;
  * this corpus is built so the orderings are unambiguous.
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  // "spark" appears in six docs (common), "join" in one (rare). Docs 1
  // and 10 have identical tf=1 and dl=4; doc 11 repeats doc 1's hit in
  // a 12-token doc.
  private lazy val tmpDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    val rows = (1 to 5).map(i => (i.toLong, "spark x1 x2 x3")) ++ Seq(
      (10L, "join x1 x2 x3"),
      (11L, "spark x1 x2 x3 f1 f2 f3 f4 f5 f6 f7 f8"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val scores: Map[Long, Long] =
    TextOps.txBm25(spark, tmpDir)
      .select(col("doc_id"), col("score_ppm"))
      .as[(Long, Long)].collect().toMap

  test("rare query term outranks a common one at equal tf and dl") {
    assert(scores(10L) > scores(1L),
      s"idf must dominate: join-doc ${scores(10L)} vs spark-doc ${scores(1L)}")
  }

  test("equal tf in a longer doc scores lower (length normalization)") {
    assert(scores(1L) > scores(11L),
      s"dl must normalize: 4-token ${scores(1L)} vs 12-token ${scores(11L)}")
  }

  test("every scored doc contains a query term; ranks are dense from 1") {
    val out = TextOps.txBm25(spark, tmpDir)
      .select(col("rank"), col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) == (1L to out.length.toLong))
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L, 5L, 10L, 11L))
  }

  test("tx_tfidf keywords the rare term, not the shared filler") {
    val top = TextOps.txTfidf(spark, tmpDir)
      .filter(col("doc_id") === 10L && col("rank") === 1L)
      .select(col("tok")).as[String].collect().toSeq
    assert(top == Seq("join"), s"got $top")
  }
}
