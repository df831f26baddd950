package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Differential: the native emoji-sequence kernel
  * (Kernels.emojiCount, the production path) must count exactly like
  * the regexp_count(EmojiClass) formulation it replaced — which is the
  * form the DuckDB oracle runs, so this pins the whole
  * kernel == Java-regex == RE2 chain. Cases cover every grammar branch
  * (keycap, flag pair, ZWJ chain, selectors) plus adversarial
  * generated strings mixing branch prefixes, lone selectors, and
  * unpaired regional indicators.
  */
class EmojiKernelSpec extends SparkSpec {
  import spark.implicits._

  private def counts(texts: Seq[String]): Seq[(Int, Int)] =
    texts.toDF("t")
      .select(
        TextFunctions.emojiCount(col("t")).as("native"),
        regexp_count(col("t"), lit(TextFunctions.EmojiClass)).as("regex"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1)))

  test("kernel equals the regex on every grammar branch") {
    val cases = Seq(
      "", "plain text, no emoji at all",
      "fire 🔥 and rocket 🚀!", // two pictographs
      "love ❤️!",                          // VS16 sequence
      "👍🏽 ok",                 // skin-tone modifier
      "👨‍👩‍👧", // ZWJ family
      "🇺🇸 usa",                // flag pair
      "🇺 lone RI",                        // unpaired RI
      "🇺🇸🇫 three RIs", // pair + unpaired
      "1️⃣ keycap", "#⃣ direct keycap",
      "5️ no keycap base", "⃣ lone enclosing keycap",
      "️ lone VS16", "🏻 lone modifier",
      "👍️🏻 sel then modifier", // one selector max
      "👍‍ stranded ZWJ",
      "👍‍x ZWJ to non-pict",
      "see ↓ below, page 12",                   // plain arrow: no match
      "© 2026 ®™")                    // BMP singletons
    counts(cases).zip(cases).foreach { case ((n, r), t) =>
      assert(n == r, s"kernel $n != regex $r on ${t.take(40)}")
    }
  }

  test("kernel equals the regex on adversarial generated mixes") {
    val parts = Seq("🔥", "❤", "️", "‍",
      "🏻", "🇺", "⃣", "1", "#", "a", " ",
      "↓", "👨")
    val rnd = new scala.util.Random(42)
    val gens = (0 until 300).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => parts(rnd.nextInt(parts.length))).mkString
    }
    counts(gens).zip(gens).foreach { case ((n, r), t) =>
      assert(n == r,
        s"kernel $n != regex $r on ${t.map(c => f"\\u$c%04x").mkString}")
    }
  }
}
