package graft

import graft.operators.TextOps

/** tx_chunk and tx_boilerplate on hand-checked fixtures: window/stride
  * arithmetic, partial final chunks, block-df thresholding, and ordered
  * reassembly of the scrubbed text.
  */
class ChunkBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def toks(n: Int, pfx: String = "w"): String =
    (0 until n).map(i => s"$pfx$i").mkString(" ")

  test("chunk windows start every stride tokens and keep the partial tail") {
    // 80 tokens, W=32, S=24 → starts 0,24,48,72; sizes 32,32,32,8.
    val got = TextOps.chunk(docsDf(toks(80)))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._2, r._3, r._4)) ==
      Seq((0L, 0L, 32L), (1L, 24L, 32L), (2L, 48L, 32L), (3L, 72L, 8L)))
    // overlap: chunk 1 starts at token 24, chunk 0 covers 0..31 → the
    // 8-token overlap region is tokens 24..31, present in both texts
    val c0 = got(0)._5.split(" ")
    val c1 = got(1)._5.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    assert(c1.head == "w24" && got(3)._5 == (72 until 80).map(i => s"w$i").mkString(" "))
  }

  test("short docs yield one chunk; empty text yields one empty chunk") {
    val got = TextOps.chunk(docsDf(toks(10), ""))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._4)) == Seq((0L, 0L, 10L), (1L, 0L, 0L)))
    assert(got(1)._5 == "")
  }

  test("boilerplate drops cross-doc blocks and keeps per-doc-unique ones") {
    // Docs share their FIRST 8-token block verbatim (df=2 → boiler);
    // each doc's remaining blocks are unique (df=1 → kept).
    val shared = toks(8, "s")
    val a = s"$shared ${toks(8, "a")} ${toks(4, "x")}" // blocks: shared, a*, partial x*
    val bDoc = s"$shared ${toks(8, "b")}"              // blocks: shared, b*
    val got = TextOps.boilerplate(docsDf(a, bDoc))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._2, r._3, r._4)) == Seq((3L, 1L, 12L), (2L, 1L, 8L)))
    assert(got(0)._5 == s"${toks(8, "a")} ${toks(4, "x")}") // order preserved
    assert(got(1)._5 == toks(8, "b"))
  }

  test("a block repeated inside ONE doc has df=1 and survives") {
    val blk = toks(8, "r")
    val got = TextOps.boilerplate(docsDf(s"$blk $blk"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((0L, 2L, 0L, 16L, s"$blk $blk")))
  }

  test("fully-boilerplate doc reassembles to empty text") {
    val blk = toks(8, "z")
    val got = TextOps.boilerplate(docsDf(blk, blk))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._5) == Seq("", ""))
    assert(got.map(_._4) == Seq(0L, 0L))
  }

  test("corpus run: chunk coverage reconstructs token counts; scrub is consistent") {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val ch = TextOps.txChunk(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(ch.map(_._1).distinct.size == nDocs)
    // each doc's max(start+size) == its token count; non-final chunks full
    val byDoc = ch.groupBy(_._1)
    byDoc.values.foreach { rs =>
      val rows = rs.sortBy(_._2)
      val n = rows.map(r => r._3 + r._4).max // doc token count
      // a chunk is full iff the window fits before the doc end (window >
      // stride, so the tail can hold SEVERAL truncated chunks)
      rows.foreach { r =>
        val want = math.min(TextOps.ChunkTokens.toLong, n - r._3)
        assert(r._4 == want, s"chunk at ${r._3} of $n-token doc")
      }
      assert(rows.map(_._2) == rows.indices.map(_.toLong))
    }
    val bp = TextOps.txBoilerplate(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(bp.size == nDocs)
    bp.foreach { case (_, nb, nboil, kept, clean) =>
      assert(nboil <= nb)
      val cleanToks = clean.split(" ").filter(_.nonEmpty).length
      assert(cleanToks == kept)
    }
    // the corpus HAS replicated docs, so the scrub must fire somewhere
    assert(bp.map(_._3).sum > 0, "expected boilerplate blocks in the corpus")
  }
}
