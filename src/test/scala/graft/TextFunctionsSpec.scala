package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokens drops empties and splits on any whitespace") {
    assert(one[collection.Seq[String]](tokens(col("t")), "a  b\n\tc").toList == List("a", "b", "c"))
    assert(one[collection.Seq[String]](tokens(col("t")), "").isEmpty)
    assert(one[collection.Seq[String]](tokens(col("t")), "   ").isEmpty)
  }

  test("emoji counting and usage bins") {
    assert(one[Int](emojiCount(col("t")), "no emoji here") == 0)
    assert(one[Int](emojiCount(col("t")), "fire 🔥 and rocket 🚀!") == 2)
    assert(one[String](emojiUsage(col("t")), "plain") == "none")
    // 1 emoji / 4 chars = 0.25 -> extreme
    assert(one[String](emojiUsage(col("t")), "ab🔥c") == "extreme")
    // UTS #51 sequences count ONCE per displayed emoji: VS16 form,
    // skin-tone modifier, ZWJ family, flag pair, keycap — and plain
    // arrows / bare digits are not emoji
    assert(one[Int](emojiCount(col("t")), "love ❤️!") == 1)
    assert(one[Int](emojiCount(col("t")), "👍🏽 ok") == 1)
    assert(one[Int](emojiCount(col("t")),
      "👨‍👩‍👧") == 1)
    assert(one[Int](emojiCount(col("t")), "🇺🇸 usa") == 1)
    assert(one[Int](emojiCount(col("t")), "1️⃣ first") == 1)
    assert(one[Int](emojiCount(col("t")), "see ↓ below, page 12") == 0)
  }

  test("length buckets at the reference thresholds") {
    assert(one[String](lengthBucket(col("t")), "x" * 749) == "Up to 750 characters long")
    assert(one[String](lengthBucket(col("t")), "x" * 750) == "Between 750 and 1,500 characters long")
    assert(one[String](lengthBucket(col("t")), "x" * 1500) == "Between 750 and 1,500 characters long")
    assert(one[String](lengthBucket(col("t")), "x" * 1501) == "Between 1,500 and 3,000 characters long")
  }

  test("hashBucket is stable and in range") {
    val buckets = Seq("a", "b", "c", "d", "e", "", "z" * 100)
      .map(s => one[Int](hashBucket(col("t"), 9), s))
    assert(buckets.forall(b => b >= 0 && b < 9))
    assert(one[Int](hashBucket(col("t"), 9), "a") == one[Int](hashBucket(col("t"), 9), "a"))
  }

  test("fingerprint normalizes case, punctuation, and spacing") {
    val a = one[String](fingerprint(col("t")), "Hello,   World!")
    val b = one[String](fingerprint(col("t")), "hello world")
    assert(a == b)
    assert(a != one[String](fingerprint(col("t")), "hello worlds"))
  }

  test("shingles fall back to whole text under n tokens") {
    assert(one[collection.Seq[String]](shingles(col("t"), 3), "a b c d").toSet == Set("a b c", "b c d"))
    assert(one[collection.Seq[String]](shingles(col("t"), 3), "a b").toList == List("a b"))
  }

  test("sentence and line-break counts on empty text") {
    assert(one[Int](sentenceCount(col("t")), "") == 0)
    assert(one[Int](sentenceCount(col("t")), "One. Two! Three?") == 3)
    assert(one[Int](lineBreakCount(col("t")), "a\nb\n") == 2)
  }

  test("hexLong decodes md5 prefixes consistently") {
    // md5("") = d41d8cd98f00b204e9800998ecf8427e; first 4 nibbles = 0xd41d
    assert(one[Long](hexLong(md5(col("t")), 4), "") == 0xd41dL)
  }
}
