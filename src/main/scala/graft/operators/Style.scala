package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Writing-style feature extraction (p17, reference 17-writing-style.py +
  * features/text_stats.py:7-31, features/bullets.py, features/dividers.py)
  * and prompt assembly (p18, reference 18-generate-prompts.py).
  *
  * Map-only single-pass projections; every ratio is integer-exact and the
  * regex line classifiers are anchored identically in both engines (no
  * backreferences — RE2-safe).
  */
object Style {

  private val t = col("text")
  private def toks = tokens(t)
  private def lines = split(t, "\n")

  private def countLines(re: String): Column =
    size(filter(lines, l => l.rlike(re))).cast("long")

  private def dividerCount(ch: String): Column = {
    val q = java.util.regex.Pattern.quote(ch)
    size(filter(lines, l => trim(l).rlike("^" + q + "{3,}$"))).cast("long")
  }

  /** p17: style features. */
  def p17Style(spark: SparkSession, sfDir: String): DataFrame = {
    val nSent = sentenceCount(t).cast("long")
    val nTok = tokenCount(t).cast("long")
    val nLines = size(lines).cast("long")
    val nEmpty = size(filter(lines, l => length(l) === 0)).cast("long")
    val nNum = countLines("^\\s*[0-9]+[.)]\\s+")
    val nLet = countLines("^\\s*[A-Za-z]+[.)]\\s+")
    val nSym = countLines("^\\s*[^A-Za-z0-9_\\s]")
    val dDash = dividerCount("-")
    val dEq = dividerCount("=")
    val dStar = dividerCount("*")
    val dTilde = dividerCount("~")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        distinctTokenCount(t).cast("long").as("vocab_distinct"),
        nSent.as("n_sentences"),
        nTok.as("n_tokens"),
        lineBreakCount(t).cast("long").as("line_breaks"),
        nLines.as("n_lines"), nEmpty.as("n_empty"),
        charCount(t, ".").cast("long").as("n_period"),
        charCount(t, ",").cast("long").as("n_comma"),
        charCount(t, ";").cast("long").as("n_semicolon"),
        charCount(t, "!").cast("long").as("n_exclaim"),
        charCount(t, "?").cast("long").as("n_question"),
        nNum.as("n_num"), nLet.as("n_let"), nSym.as("n_sym"),
        dDash.as("d1"), dEq.as("d2"), dStar.as("d3"), dTilde.as("d4"))
      .selectExpr(
        "doc_id", "vocab_distinct", "n_sentences",
        "n_tokens * 1000000L div greatest(n_sentences, 1L) AS avg_sent_len_ppm",
        "line_breaks",
        "CASE WHEN n_lines > 1 THEN n_empty * 1000000L div (n_lines - 1) ELSE 0L END AS empty_line_ppm",
        "n_period", "n_comma", "n_semicolon", "n_exclaim", "n_question",
        """CASE WHEN (CASE WHEN n_num > 0 THEN 1 ELSE 0 END) + (CASE WHEN n_let > 0 THEN 1 ELSE 0 END)
          |       + (CASE WHEN n_sym > 0 THEN 1 ELSE 0 END) > 1 THEN 'Mixed Bullet Styles'
          |     WHEN n_num > 0 THEN 'Numbered'
          |     WHEN n_let > 0 THEN 'Lettered'
          |     WHEN n_sym > 0 THEN 'Symbolic'
          |     ELSE 'None' END AS bullet_style""".stripMargin,
        """CASE WHEN d1 = 0 AND d2 = 0 AND d3 = 0 AND d4 = 0 THEN 'None'
          |     WHEN d1 >= d2 AND d1 >= d3 AND d1 >= d4 THEN '-'
          |     WHEN d2 >= d3 AND d2 >= d4 THEN '='
          |     WHEN d3 >= d4 THEN '*'
          |     ELSE '~' END AS divider_style""".stripMargin,
        """CASE WHEN n_tokens div greatest(n_sentences, 1L) < 8 THEN 'fast'
          |     WHEN n_tokens div greatest(n_sentences, 1L) < 15 THEN 'medium'
          |     ELSE 'slow' END AS pacing""".stripMargin)
      .orderBy(col("doc_id"))
  }

  /** Generation-prompt column (p18 template; shared with p22's
    * post-generation family). */
  private[operators] def genPromptCol: Column =
    concat(
      lit("Write a "), Annotations.structureCol,
      lit(" social media post about \""), Annotations.topicCol,
      lit("\" in a "), Annotations.toneCol,
      lit(" tone.\n**Length**: "), lengthBucket(t),
      lit("\n**Emoji Usage**: "), emojiUsage(t))

  /** p18: generation-prompt assembly from extracted features
    * (18-generate-prompts.py template semantics over this engine's
    * deterministic feature set). */
  def p18Prompts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), genPromptCol.as("prompt"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p17_style"   -> (p17Style _),
    "p18_prompts" -> (p18Prompts _))

  // ---- DuckDB oracle ----

  private val toksSql =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"
  private val linesSql = "regexp_split_to_array(text, '\\n')"
  private val sentSql =
    "length(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != ''))"

  private def countLinesSql(re: String): String =
    s"length(list_filter($linesSql, l -> regexp_matches(l, '$re')))"

  private def dividerCountSql(re: String): String =
    s"length(list_filter($linesSql, l -> regexp_matches(trim(l), '$re')))"

  private def charCountSql(ch: String): String = {
    val esc = if (ch == "'") "''" else ch
    s"(length(text) - length(replace(text, '$esc', '')))"
  }

  /** DuckDB mirror of [[genPromptCol]] (shared with Datasets' p22). */
  private[operators] val genPromptSql: String =
    s"""concat('Write a ', ${Annotations.structureSql},
       |    ' social media post about "', ${Annotations.topicSql},
       |    '" in a ', ${Annotations.toneInlineSql},
       |    ' tone.', chr(10), '**Length**: ', ${DocPipeline.lengthBucketSql},
       |    chr(10), '**Emoji Usage**: ', ${DocPipeline.emojiUsageSql})""".stripMargin

  val oracle: Map[String, String] = Map(
    "p17_style" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(length(list_distinct($toksSql)) AS BIGINT) AS vocab_distinct,
         |    CAST($sentSql AS BIGINT) AS n_sentences,
         |    CAST(length($toksSql) AS BIGINT) AS n_tokens,
         |    CAST(length(text) - length(replace(text, chr(10), '')) AS BIGINT) AS line_breaks,
         |    CAST(length($linesSql) AS BIGINT) AS n_lines,
         |    CAST(length(list_filter($linesSql, l -> length(l) = 0)) AS BIGINT) AS n_empty,
         |    CAST(${charCountSql(".")} AS BIGINT) AS n_period,
         |    CAST(${charCountSql(",")} AS BIGINT) AS n_comma,
         |    CAST(${charCountSql(";")} AS BIGINT) AS n_semicolon,
         |    CAST(${charCountSql("!")} AS BIGINT) AS n_exclaim,
         |    CAST(${charCountSql("?")} AS BIGINT) AS n_question,
         |    CAST(${countLinesSql("^\\s*[0-9]+[.)]\\s+")} AS BIGINT) AS n_num,
         |    CAST(${countLinesSql("^\\s*[A-Za-z]+[.)]\\s+")} AS BIGINT) AS n_let,
         |    CAST(${countLinesSql("^\\s*[^A-Za-z0-9_\\s]")} AS BIGINT) AS n_sym,
         |    CAST(${dividerCountSql("^-{3,}$")} AS BIGINT) AS d1,
         |    CAST(${dividerCountSql("^={3,}$")} AS BIGINT) AS d2,
         |    CAST(${dividerCountSql("^\\*{3,}$")} AS BIGINT) AS d3,
         |    CAST(${dividerCountSql("^~{3,}$")} AS BIGINT) AS d4
         |  FROM documents)
         |SELECT doc_id, vocab_distinct, n_sentences,
         |  n_tokens * 1000000 // GREATEST(n_sentences, 1) AS avg_sent_len_ppm,
         |  line_breaks,
         |  CASE WHEN n_lines > 1 THEN n_empty * 1000000 // (n_lines - 1) ELSE 0 END AS empty_line_ppm,
         |  n_period, n_comma, n_semicolon, n_exclaim, n_question,
         |  CASE WHEN (CASE WHEN n_num > 0 THEN 1 ELSE 0 END) + (CASE WHEN n_let > 0 THEN 1 ELSE 0 END)
         |         + (CASE WHEN n_sym > 0 THEN 1 ELSE 0 END) > 1 THEN 'Mixed Bullet Styles'
         |       WHEN n_num > 0 THEN 'Numbered'
         |       WHEN n_let > 0 THEN 'Lettered'
         |       WHEN n_sym > 0 THEN 'Symbolic'
         |       ELSE 'None' END AS bullet_style,
         |  CASE WHEN d1 = 0 AND d2 = 0 AND d3 = 0 AND d4 = 0 THEN 'None'
         |       WHEN d1 >= d2 AND d1 >= d3 AND d1 >= d4 THEN '-'
         |       WHEN d2 >= d3 AND d2 >= d4 THEN '='
         |       WHEN d3 >= d4 THEN '*'
         |       ELSE '~' END AS divider_style,
         |  CASE WHEN n_tokens // GREATEST(n_sentences, 1) < 8 THEN 'fast'
         |       WHEN n_tokens // GREATEST(n_sentences, 1) < 15 THEN 'medium'
         |       ELSE 'slow' END AS pacing
         |FROM f ORDER BY doc_id""".stripMargin,
    "p18_prompts" ->
      s"""SELECT doc_id, $genPromptSql AS prompt
         |FROM documents ORDER BY doc_id""".stripMargin)
}
