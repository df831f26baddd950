package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Kernels

/** The manual-walk tokenizer must be byte-for-byte equal to the
  * ENGINE-SHARED regex form `split("[ \t\n\f\r]+").filter(_.nonEmpty)`
  * — RE2's `\s` set, which is what the DuckDB oracle mirrors written
  * as `\s` read. Java's `\s` additionally contains \x0B (vertical
  * tab); the walk deliberately does NOT treat \x0B as whitespace
  * (the r11 canary extension surfaced that Java/RE2 divergence — see
  * Kernels.isWsChar). Also covers Unicode whitespace lookalikes (NBSP
  * is neither Java nor RE2 \s and stays inside a token) and multibyte
  * content for the byte-walking wordTokens. Pure JVM — no Spark
  * session needed. */
class TokenizeWalkSpec extends AnyFunSuite {

  private def regexForm(s: String): Array[String] =
    s.split("[ \t\n\f\r]+").filter(_.nonEmpty)

  private def wordTokensStrings(s: String): Seq[String] = {
    val a = Kernels.wordTokens(UTF8String.fromString(s))
    (0 until a.numElements()).map(i =>
      a.getUTF8String(i).toString)
  }

  private val fixed = Seq(
    "", " ", "\t\n\f\r", "a", " a ", "a b", "  a\t\tb\n c  ",
    " nbsp stays one-token", // NBSP is not \s on either engine
    " em-space too",
    "vertical\u000Btab glues words", // \x0B: Java \s but NOT RE2 \s
    "\u000B \u000B mixed with real spaces \u000B",
    "emoji 🔥🚀 and 中文字 mixed 👨‍👩",
    "trailing ws \r\n", "\n\nleading", "one", "a  b   cd",
    "mixed  real and thin")

  test("tokenize equals the regex form on the fixed corpus") {
    fixed.foreach { s =>
      assert(Kernels.tokenize(s).toSeq == regexForm(s).toSeq, s"input=${s}")
    }
  }

  test("a vertical tab stays inside its token (RE2 semantics, not Java)") {
    assert(Kernels.tokenize("a\u000Bb").toSeq == Seq("a\u000Bb"))
    assert(wordTokensStrings("a\u000Bb") == Seq("a\u000Bb"))
  }

  test("wordTokens byte walk equals the regex form on the fixed corpus") {
    fixed.foreach { s =>
      assert(wordTokensStrings(s) == regexForm(s).toSeq, s"input=${s}")
    }
  }

  test("property: walk == regex on generated whitespace/unicode soup") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val piece = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "\u000B"),
      Gen.oneOf(" ", " ", " ", "🔥", "中", "naïve", "a‍b"))
    val gen = Gen.listOf(piece).map(_.mkString)
    val prop = forAll(gen) { s =>
      Kernels.tokenize(s).toSeq == regexForm(s).toSeq &&
        wordTokensStrings(s) == regexForm(s).toSeq
    }
    val cfg = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500)
    val res = org.scalacheck.Test.check(cfg, prop)
    assert(res.passed, res.status.toString)
  }
}
