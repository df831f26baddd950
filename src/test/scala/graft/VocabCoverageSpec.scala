package graft

import graft.operators.TextOps

/** tx_vocab_coverage on hand-checked Zipf fixtures: the coverage curve
  * is read at the declared targets with frequency-then-token ranking.
  */
class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def cov(texts: String*): Seq[(Long, Long, Long, Long)] =
    TextOps.vocabCoverage(texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq

  private def rep(tok: String, n: Int): String = Seq.fill(n)(tok).mkString(" ")

  test("coverage targets read the cumulative curve at the first qualifying rank") {
    // a×50 b×30 c×15 d×5 (total 100): 50% → {a}; 90% → {a,b,c} (80 < 90
    // at two tokens); 99% → all four.
    val got = cov(s"${rep("a", 50)} ${rep("b", 30)} ${rep("c", 15)} ${rep("d", 5)}")
    assert(got == Seq(
      (50L, 1L, 50L, 100L),
      (90L, 3L, 95L, 100L),
      (99L, 4L, 100L, 100L)))
  }

  test("equal frequencies rank alphabetically") {
    // c×20 a×10 b×10 (total 40): ranks c,a,b. 50% of 40 = 20 → exactly c.
    val got = cov(s"${rep("c", 20)} ${rep("a", 10)} ${rep("b", 10)}")
    assert(got == Seq(
      (50L, 1L, 20L, 40L),
      (90L, 3L, 40L, 40L),
      (99L, 3L, 40L, 40L)))
  }

  test("corpus run produces one row per target with a monotone curve") {
    val rows = TextOps.txVocabCoverage(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == TextOps.VocabTargets)
    assert(rows.map(_._2) == rows.map(_._2).sorted) // vocab_size monotone
    assert(rows.map(_._3) == rows.map(_._3).sorted) // covered monotone
    rows.foreach { case (pct, size, covered, total) =>
      assert(covered * 100 >= pct * total)
      assert(size >= 1L && covered <= total)
    }
  }
}
