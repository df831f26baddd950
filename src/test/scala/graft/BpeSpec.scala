package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Bpe, Kernels}

/** The BPE span-walk kernel must equal the oracle's formulation — the
  * bracket-encoded nested-replace chain over the SAME embedded merge
  * table (Java String.replace and SQL replace are both left-to-right
  * non-overlapping literal rewrites, so [[Bpe.tokenCountViaReplaceChain]]
  * is a faithful Scala transcription of the generated DuckDB mirror).
  * Pure JVM — no Spark session needed. */
class BpeSpec extends AnyFunSuite {

  private def kernelStats(s: String): (Long, Long, Long) = {
    val r = Kernels.bpeSubwordStats(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The full reference pipeline: ASCII case fold, [a-z]+ word split,
    * per-word replace chain. */
  private def referenceStats(s: String): (Long, Long, Long) = {
    val folded = s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    val words = folded.split("[^a-z]+").filter(_.nonEmpty)
    (words.length.toLong, words.map(_.length.toLong).sum,
      words.map(w => Bpe.tokenCountViaReplaceChain(w).toLong).sum)
  }

  test("merge table respects creation order (in-order == priority BPE)") {
    val known = scala.collection.mutable.Set[String]()
    ('a' to 'z').foreach(c => known += c.toString)
    Bpe.Merges.foreach { case (p, q) =>
      assert(known.contains(p), s"left component '$p' predates its rule")
      assert(known.contains(q), s"right component '$q' predates its rule")
      known += (p + q)
    }
  }

  test("kernel equals the replace-chain reference on fixed fixtures") {
    val fixed = Seq(
      "", " ", "the", "The THE tHe", "thether", "nation", "stations",
      "ment mention payment", "aaaa", "abababab", "ing king making",
      "The quick brown fox jumps over the lazy dog",
      "inter-national, co-operation; ANTidisestablishmentARIANISM!",
      "mixed 123 digits and-hyphens under_scores",
      "emoji 🔥 and 中文 between words",
      "a", "z", "qqq xyzzy", "consideration international")
    fixed.foreach { s =>
      assert(kernelStats(s) == referenceStats(s), s"input=$s")
    }
  }

  test("kernel equals the replace-chain reference on fuzzed inputs") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      "ab", "thein", "abcdefghijklmnopqrstuvwxyz",
      "aetionsr ABC.-", "the and ing ation")
    for (_ <- 0 until 400) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(40)
      val s = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(kernelStats(s) == referenceStats(s), s"input=$s")
    }
  }

  test("segmentation is real: common fragments compress, noise does not") {
    // "the" is one token; a letterless string has none; random
    // consonant runs stay near one token per char.
    assert(kernelStats("the")._3 == 1L)
    assert(kernelStats("nation")._3 < 6L)
    assert(kernelStats("12345 !!!") == ((0L, 0L, 0L)))
    val (_, chars, toks) = kernelStats("bcdfgxkqz")
    assert(toks >= chars - 2) // no vowel bigrams to merge
  }
}
