package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Kernels

/** The manual-walk tokenizer must be byte-for-byte equal to the regex
  * form it replaced (`split("\\s+").filter(_.nonEmpty)`), including on
  * Unicode whitespace lookalikes (NBSP is NOT Java \s and must stay
  * inside a token) and on multibyte content for the byte-walking
  * wordTokens. Pure JVM — no Spark session needed. */
class TokenizeWalkSpec extends AnyFunSuite {

  private def regexForm(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  private def wordTokensStrings(s: String): Seq[String] = {
    val a = Kernels.wordTokens(UTF8String.fromString(s))
    (0 until a.numElements()).map(i =>
      a.getUTF8String(i).toString)
  }

  private val fixed = Seq(
    "", " ", "\t\n\f\r", "a", " a ", "a b", "  a\t\tb\n c  ",
    " nbsp stays one-token", // NBSP is not Java \s
    " em-space too",
    "emoji 🔥🚀 and 中文字 mixed 👨‍👩",
    "trailing ws \r\n", "\n\nleading", "one", "a  b   cd",
    "mixed  real and thin")

  test("tokenize equals the regex form on the fixed corpus") {
    fixed.foreach { s =>
      assert(Kernels.tokenize(s).toSeq == regexForm(s).toSeq, s"input=${s}")
    }
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
      Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
      Gen.oneOf(" ", " ", " ", "🔥", "中", "naïve", "a‍b"))
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
