package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks.
  *
  * Everything here is a composition of `org.apache.spark.sql.functions`
  * (whole-stage codegen'd, no UDFs) and has an exact DuckDB-SQL mirror so
  * operators built on top stay oracle-checkable. Semantics follow the
  * reference's feature extractors (reference: features/text_stats.py,
  * features/bullets.py, features/dividers.py, 2-label.py).
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped (mirror:
    * list_filter(regexp_split_to_array(t,'\s+'), x -> x != '')) — native
    * one-pass expression; the HOF form runs an interpreted lambda per
    * token and this column underlies most annotation operators. */
  def tokens(c: Column): Column = NativeExpressions.wordTokens(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Vocabulary richness: distinct token count (reference:
    * features/text_stats.py:analyze_vocabulary_usage). */
  def distinctTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** BPE-ish subword count: word chunks of <=4 chars + punctuation marks,
    * approximating a byte-pair tokenizer's piece count (native char walk;
    * mirror: regexp_count over "[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"). */
  def bpeTokenCount(c: Column): Column = NativeExpressions.bpeCount(c)

  /** Count occurrences of one literal character. */
  def charCount(c: Column, ch: String): Column =
    length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(ch), ""))

  /** Newline count (reference: features/text_stats.py:analyze_line_breaks). */
  def lineBreakCount(c: Column): Column = charCount(c, "\n")

  /** Supplementary-plane emoji + misc symbols, as code points. */
  val EmojiClass = "[\\x{1F000}-\\x{1FAFF}\\x{2600}-\\x{27BF}\\x{FE0F}\\x{2190}-\\x{21FF}\\x{2B00}-\\x{2BFF}]"

  /** Emoji code-point count (reference: 2-label.py emoji_frequency_analysis). */
  def emojiCount(c: Column): Column = regexp_count(c, lit(EmojiClass))

  /** Emoji frequency = emoji / chars (0 for empty text). */
  def emojiFrequency(c: Column): Column =
    when(length(c) > 0, emojiCount(c).cast("double") / length(c)).otherwise(lit(0.0))

  /** Usage bins from the reference's default thresholds (2-label.py
    * load_emoji_bins): none/very low/low/medium/high/extreme. */
  def emojiUsage(c: Column): Column = {
    val f = emojiFrequency(c)
    when(f <= 0.0, "none")
      .when(f <= 0.0005, "very low")
      .when(f <= 0.001, "low")
      .when(f <= 0.005, "medium")
      .when(f <= 0.01, "high")
      .otherwise("extreme")
  }

  /** Length buckets (reference: 2-label.py post_length_analysis). */
  def lengthBucket(c: Column): Column =
    when(length(c) >= 1501, "Between 1,500 and 3,000 characters long")
      .when(length(c) >= 750, "Between 750 and 1,500 characters long")
      .otherwise("Up to 750 characters long")

  def hashtagCount(c: Column): Column = regexp_count(c, lit("#\\w+"))

  def urlCount(c: Column): Column = regexp_count(c, lit("https?://\\S+"))

  /** CJK character presence (reference: 7-clean-topics.py
    * contains_disallowed's 一-鿿 check). */
  def hasCjk(c: Column): Column = c.rlike("[\\x{4e00}-\\x{9fff}]")

  /** Disallowed annotation content (reference: 7-clean-topics.py). */
  def isDisallowedAnnotation(c: Column): Column =
    c.contains("...") || c.contains("?") || c.contains("_") ||
      c.contains("{") || c.contains("}") || c.contains("[") || c.contains("]") ||
      c.contains("<") || c.contains(">") || hasCjk(c) ||
      lower(trim(c)) === "unknown"

  /** Sentence count: runs terminated by . ! ? or end-of-text (native
    * one-pass expression). */
  def sentenceCount(c: Column): Column = NativeExpressions.sentenceCount(c)

  /** Normalized fingerprint: lowercase, strip non-alnum, collapse spaces →
    * md5. Whole-document exact-dup key robust to case/punct jitter
    * (native fused expression — same lower/regex/md5 chain, one pass). */
  def fingerprint(c: Column): Column = NativeExpressions.fingerprint(c)

  /** Stable bucket in [0, n) from md5 — identical arithmetic in DuckDB:
    * (ascii(h1)*256 + ascii(h2)) % n over the first two hex chars. */
  def hashBucket(c: Column, n: Int): Column = {
    val h = md5(c)
    (ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % n
  }

  /** The same bucket as DuckDB SQL, for oracle assembly. */
  def hashBucketSql(expr: String, n: Int): String =
    s"(ascii(substr(md5($expr),1,1))*256 + ascii(substr(md5($expr),2,1))) % $n"

  /** Decimal value of one hex digit (md5 output is lowercase hex). */
  def nibble(c: Column): Column =
    ascii(c) - when(c >= "a", 87).otherwise(48)

  /** First `n` hex chars of `h` as an unsigned long (n <= 15). Identical
    * arithmetic is emitted by [[nibbleSql]]-based SQL for the DuckDB
    * oracle, so hash-derived integers compare exactly across engines. */
  def hexLong(h: Column, n: Int): Column =
    (1 to n).map { j =>
      val c = substring(h, j, 1)
      nibble(c) * lit(1L << (4 * (n - j)))
    }.reduce(_ + _)

  /** DuckDB mirror of [[hexLong]] over SQL expression `h`. */
  def hexLongSql(h: String, n: Int): String =
    (1 to n).map { j =>
      s"(ascii(substr($h,$j,1)) - CASE WHEN substr($h,$j,1) >= 'a' THEN 87 ELSE 48 END) * CAST(${1L << (4 * (n - j))} AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Distinct word n-gram shingles (falls back to the whole token string
    * for texts shorter than n tokens). */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** DuckDB mirror of [[shingles]] (expects `toks` bound to the token list). */
  def shinglesSql(toks: String, n: Int): String =
    s"""list_distinct(CASE WHEN len($toks) >= $n
       |  THEN [array_to_string($toks[i:i+${n - 1}], ' ') FOR i IN range(1, len($toks) - ${n - 2})]
       |  ELSE [array_to_string($toks, ' ')] END)""".stripMargin

  /** Count of tokens that are members of `set` (with repeats) — native
    * one-pass expression (the HOF form ran an interpreted lambda plus an
    * array_contains scan per token). */
  def tokenSetCount(c: Column, set: Seq[String]): Column =
    NativeExpressions.tokenSetCount(tokens(c), set)

  /** Word-boundary occurrence count of a literal word. */
  def wordCount(c: Column, w: String): Column =
    regexp_count(c, lit("\\b" + java.util.regex.Pattern.quote(w) + "\\b"))
}
