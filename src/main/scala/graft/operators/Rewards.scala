package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Reward functions over (requirement, completion) pairs
  * (reference: training/rewards — length, hashtags, emoji, punctuation,
  * linebreaks, vocabulary, divider, CJK, sentence structure + the
  * weight-averaged aggregate).
  *
  * The documents table stands in for completions; the requirement side of
  * each pair is synthesized deterministically from doc_id (both engines
  * compute the identical arithmetic), exercising the reference's scoring
  * branches. Discrete branch scores are integer ppm end-to-end; the two
  * continuous formulas (length in-range ramp) run the identical double
  * op sequence in both engines before one final rounding.
  *
  * Map-only, shuffle-free, codegen-friendly (no UDFs).
  */
object Rewards {

  private val t = col("text")

  /** rw_length per training/rewards/length.py:6-57
    * (precise_post_length_reward with the text's own bucket). */
  private def lengthRewardPpm: Column = {
    val l = length(t).cast("double")
    val inUp750 = lit(0.7) + lit(0.3) * least(lit(1.0), l / lit(750.0))
    val in750_1500 = lit(0.7) + lit(0.3) * ((l - lit(750.0)) / lit(750.0))
    val in1500_3000 = lit(0.7) + lit(0.3) * ((l - lit(1500.0)) / lit(1500.0))
    val over3000 = (l - lit(3000.0)) / lit(3000.0)
    val r = when(length(t) <= 750, inUp750)
      .when(length(t) <= 1500, in750_1500)
      .when(length(t) <= 3000, in1500_3000)
      .when(over3000 <= 0.1, lit(0.6))
      .when(over3000 <= 0.25, lit(0.3))
      .otherwise(lit(0.0))
    round(r * 1000000, 0).cast("long")
  }

  private val lengthRewardSql =
    """CAST(round(CASE
      |  WHEN length(text) <= 750 THEN 0.7 + 0.3 * LEAST(1.0, CAST(length(text) AS DOUBLE) / 750.0)
      |  WHEN length(text) <= 1500 THEN 0.7 + 0.3 * ((CAST(length(text) AS DOUBLE) - 750.0) / 750.0)
      |  WHEN length(text) <= 3000 THEN 0.7 + 0.3 * ((CAST(length(text) AS DOUBLE) - 1500.0) / 1500.0)
      |  WHEN (CAST(length(text) AS DOUBLE) - 3000.0) / 3000.0 <= 0.1 THEN 0.6
      |  WHEN (CAST(length(text) AS DOUBLE) - 3000.0) / 3000.0 <= 0.25 THEN 0.3
      |  ELSE 0.0 END * 1000000, 0) AS BIGINT)""".stripMargin

  /** rw_hashtags per training/rewards/hashtags.py:6-14 (tail line,
    * <=3 free then -0.2 each). */
  private def hashtagRewardPpm(st: Column): Column = {
    val n = st.getField("tail_hashtags").cast("long")
    when(n <= 3, lit(1000000L))
      .otherwise(greatest(lit(0L), lit(1000000L) - lit(200000L) * (n - 3)))
  }

  private val hashtagRewardSql =
    """CAST(CASE WHEN length(regexp_extract_all(regexp_split_to_array(text, '\n')[-1], '#[A-Za-z0-9_]+')) <= 3 THEN 1000000
      |  ELSE GREATEST(0, 1000000 - 200000 * (length(regexp_extract_all(regexp_split_to_array(text, '\n')[-1], '#[A-Za-z0-9_]+')) - 3)) END AS BIGINT)""".stripMargin

  /** rw_emoji per training/rewards/emoji.py:40-66
    * (enhanced_emoji_usage_reward; required bin = doc_id % 6). Usage bin
    * from the kernel's emoji count — same frequency arithmetic as
    * TextFunctions.emojiUsage (emo_total == emojiCount, asserted by
    * RewardStatsSpec). */
  private def emojiRewardPpm(st: Column): Column = {
    val f = when(length(t) > 0,
      st.getField("emo_total").cast("double") / length(t)).otherwise(lit(0.0))
    val actualIdx = when(f <= 0.0, lit(0)).when(f <= 0.0005, lit(1))
      .when(f <= 0.001, lit(2)).when(f <= 0.005, lit(3))
      .when(f <= 0.01, lit(4)).otherwise(lit(5))
    val reqIdx = (col("doc_id") % 6).cast("int")
    val d = abs(reqIdx - actualIdx)
    when(d === 0, lit(1000000L)).when(d === 1, lit(700000L))
      .when(d === 2, lit(400000L)).otherwise(lit(0L))
  }

  private val emojiRewardSql = {
    val actualIdx =
      s"""(CASE ${DocPipeline.emojiUsageSql}
         |  WHEN 'none' THEN 0 WHEN 'very low' THEN 1 WHEN 'low' THEN 2
         |  WHEN 'medium' THEN 3 WHEN 'high' THEN 4 ELSE 5 END)""".stripMargin
    s"""CAST(CASE abs(CAST(doc_id % 6 AS INTEGER) - $actualIdx)
       |  WHEN 0 THEN 1000000 WHEN 1 THEN 700000 WHEN 2 THEN 400000 ELSE 0 END AS BIGINT)""".stripMargin
  }

  /** rw_punct per training/rewards/punctuation.py:29-66: five punctuation
    * families, requested level derived from doc_id parity, thresholds on
    * count/length; per-type scores in integer millis, averaged exactly.
    * (field, sqlChar, k, low, normal, heavy) — counts from the kernel's
    * single char scan. */
  private val punctTypes = Seq(
    ("n_period", ".", 0, 0.01, 0.02, 0.03),
    ("n_comma", ",", 1, 0.01, 0.02, 0.03),
    ("n_exclaim", "!", 2, 0.001, 0.005, 0.01),
    ("n_question", "?", 3, 0.001, 0.005, 0.01),
    ("n_semicolon", ";", 4, 0.0005, 0.001, 0.002))

  private def punctRewardPpm(st: Column): Column = {
    val len = length(t).cast("double")
    val typeScores = punctTypes.map { case (field, _, k, lo, nm, hv) =>
      val freq = st.getField(field).cast("double") / len
      val heavy = ((col("doc_id") + k) % 2) === 0
      when(length(t) === 0, lit(300L * 1000))
        .when(heavy,
          when(freq >= hv, lit(1000000L)).when(freq >= nm, lit(700000L))
            .when(freq >= lo, lit(400000L)).otherwise(lit(100000L)))
        .otherwise(
          when(freq >= lo && freq <= nm, lit(1000000L))
            .when(freq < lo, lit(600000L))
            .when(freq < hv, lit(800000L)).otherwise(lit(400000L)))
    }
    // Each type score is a multiple of 100k, so the sum/5 is exact in
    // double and truncation == DuckDB's integer // 5.
    (typeScores.reduce(_ + _) / lit(5L)).cast("long")
  }

  private val punctRewardSql = {
    val parts = punctTypes.map { case (_, ch, k, lo, nm, hv) =>
      val esc = if (ch == "'") "''" else ch
      val freq = s"(CAST(length(text) - length(replace(text, '$esc', '')) AS DOUBLE) / length(text))"
      s"""(CASE WHEN length(text) = 0 THEN 300000
         |  WHEN (doc_id + $k) % 2 = 0 THEN
         |    CASE WHEN $freq >= $hv THEN 1000000 WHEN $freq >= $nm THEN 700000
         |         WHEN $freq >= $lo THEN 400000 ELSE 100000 END
         |  ELSE
         |    CASE WHEN $freq >= $lo AND $freq <= $nm THEN 1000000
         |         WHEN $freq < $lo THEN 600000
         |         WHEN $freq < $hv THEN 800000 ELSE 400000 END END)""".stripMargin
    }
    s"CAST((${parts.mkString(" + ")}) // 5 AS BIGINT)"
  }

  /** rw_linebreaks per training/rewards/linebreaks.py:28-72; requested
    * style = doc_id % 4 over [frequent, fewer, none, moderate]. */
  private def linebreakRewardPpm(st: Column): Column = {
    val nLines = st.getField("n_lines").cast("double")
    val ratio = when(length(t) === 0 || nLines <= 1, lit(0.0))
      .otherwise((nLines - 1) / length(t).cast("double") * 100)
    val req = col("doc_id") % 4
    when(req === 0, // frequent
      when(ratio > 2, 1000000L).when(ratio > 1.5, 800000L).when(ratio > 1, 600000L)
        .when(ratio > 0.5, 400000L).otherwise(200000L))
      .when(req === 1, // fewer
        when(ratio > 0.2 && ratio <= 0.8, 1000000L)
          .when((ratio > 0 && ratio <= 0.2) || (ratio > 0.8 && ratio <= 1.2), 700000L)
          .when(ratio > 1.2, 300000L).otherwise(500000L))
      .when(req === 2, // none
        when(ratio === 0.0, 1000000L).when(ratio <= 0.2, 700000L)
          .when(ratio <= 0.5, 400000L).otherwise(200000L))
      .otherwise( // moderate
        when(ratio > 0.8 && ratio <= 1.5, 1000000L)
          .when((ratio > 0.5 && ratio <= 0.8) || (ratio > 1.5 && ratio <= 2), 800000L)
          .when((ratio > 0.2 && ratio <= 0.5) || (ratio > 2 && ratio <= 2.5), 500000L)
          .otherwise(300000L))
  }

  private val linebreakRewardSql = {
    val ratio =
      """(CASE WHEN length(text) = 0 OR length(regexp_split_to_array(text, '\n')) <= 1 THEN 0.0
        |  ELSE (CAST(length(regexp_split_to_array(text, '\n')) AS DOUBLE) - 1) / length(text) * 100 END)""".stripMargin
    s"""CAST(CASE WHEN doc_id % 4 = 0 THEN
       |    CASE WHEN $ratio > 2 THEN 1000000 WHEN $ratio > 1.5 THEN 800000
       |         WHEN $ratio > 1 THEN 600000 WHEN $ratio > 0.5 THEN 400000 ELSE 200000 END
       |  WHEN doc_id % 4 = 1 THEN
       |    CASE WHEN $ratio > 0.2 AND $ratio <= 0.8 THEN 1000000
       |         WHEN ($ratio > 0 AND $ratio <= 0.2) OR ($ratio > 0.8 AND $ratio <= 1.2) THEN 700000
       |         WHEN $ratio > 1.2 THEN 300000 ELSE 500000 END
       |  WHEN doc_id % 4 = 2 THEN
       |    CASE WHEN $ratio = 0.0 THEN 1000000 WHEN $ratio <= 0.2 THEN 700000
       |         WHEN $ratio <= 0.5 THEN 400000 ELSE 200000 END
       |  ELSE
       |    CASE WHEN $ratio > 0.8 AND $ratio <= 1.5 THEN 1000000
       |         WHEN ($ratio > 0.5 AND $ratio <= 0.8) OR ($ratio > 1.5 AND $ratio <= 2) THEN 800000
       |         WHEN ($ratio > 0.2 AND $ratio <= 0.5) OR ($ratio > 2 AND $ratio <= 2.5) THEN 500000
       |         ELSE 300000 END END AS BIGINT)""".stripMargin
  }

  /** rw_vocab per training/rewards/vocabulary.py:30-74; requested level =
    * doc_id % 4 over [rich, developed, normal, conservative]. */
  private def vocabRewardPpm(st: Column): Column = {
    val total = st.getField("awords_total").cast("double")
    val ratio = st.getField("awords_distinct").cast("double") / greatest(total, lit(1.0))
    val req = col("doc_id") % 4
    when(st.getField("awords_total") === 0, lit(200000L))
      .when(req === 0, // rich
        when(ratio > 0.5, 1000000L).when(ratio > 0.4, 800000L)
          .when(ratio > 0.3, 500000L).otherwise(300000L))
      .when(req === 1, // developed
        when(ratio > 0.35 && ratio <= 0.5, 1000000L)
          .when((ratio > 0.3 && ratio <= 0.35) || (ratio > 0.5 && ratio <= 0.6), 800000L)
          .when((ratio > 0.25 && ratio <= 0.3) || ratio > 0.6, 500000L)
          .otherwise(300000L))
      .when(req === 2, // normal
        when(ratio > 0.25 && ratio <= 0.35, 1000000L)
          .when((ratio > 0.2 && ratio <= 0.25) || (ratio > 0.35 && ratio <= 0.4), 800000L)
          .when((ratio > 0.15 && ratio <= 0.2) || (ratio > 0.4 && ratio <= 0.5), 500000L)
          .otherwise(300000L))
      .otherwise( // conservative
        when(ratio <= 0.25, 1000000L).when(ratio <= 0.3, 800000L)
          .when(ratio <= 0.35, 500000L).otherwise(300000L))
  }

  private val vocabRewardSql = {
    val words = "list_transform(list_filter(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''), w -> regexp_matches(w, '^[A-Za-z]+$')), w -> lower(w))"
    val ratio = s"(CAST(length(list_distinct($words)) AS DOUBLE) / length($words))"
    s"""CAST(CASE WHEN length($words) = 0 THEN 200000
       |  WHEN doc_id % 4 = 0 THEN
       |    CASE WHEN $ratio > 0.5 THEN 1000000 WHEN $ratio > 0.4 THEN 800000
       |         WHEN $ratio > 0.3 THEN 500000 ELSE 300000 END
       |  WHEN doc_id % 4 = 1 THEN
       |    CASE WHEN $ratio > 0.35 AND $ratio <= 0.5 THEN 1000000
       |         WHEN ($ratio > 0.3 AND $ratio <= 0.35) OR ($ratio > 0.5 AND $ratio <= 0.6) THEN 800000
       |         WHEN ($ratio > 0.25 AND $ratio <= 0.3) OR $ratio > 0.6 THEN 500000
       |         ELSE 300000 END
       |  WHEN doc_id % 4 = 2 THEN
       |    CASE WHEN $ratio > 0.25 AND $ratio <= 0.35 THEN 1000000
       |         WHEN ($ratio > 0.2 AND $ratio <= 0.25) OR ($ratio > 0.35 AND $ratio <= 0.4) THEN 800000
       |         WHEN ($ratio > 0.15 AND $ratio <= 0.2) OR ($ratio > 0.4 AND $ratio <= 0.5) THEN 500000
       |         ELSE 300000 END
       |  ELSE
       |    CASE WHEN $ratio <= 0.25 THEN 1000000 WHEN $ratio <= 0.3 THEN 800000
       |         WHEN $ratio <= 0.35 THEN 500000 ELSE 300000 END END AS BIGINT)""".stripMargin
  }

  /** rw_divider per training/rewards/divider.py:7-35; requested divider =
    * doc_id % 4 over [-, =, *, ~]; full-line runs of >=3. */
  private def dividerRewardPpm(st: Column): Column = {
    val found = Seq("div_dash", "div_eq", "div_star", "div_tilde")
      .map(f => st.getField(f) > 0)
    val reqFound = when(col("doc_id") % 4 === 0, found(0))
      .when(col("doc_id") % 4 === 1, found(1))
      .when(col("doc_id") % 4 === 2, found(2))
      .otherwise(found(3))
    val anyFound = found.reduce(_ || _)
    when(reqFound, lit(1000000L)).when(anyFound, lit(300000L)).otherwise(lit(0L))
  }

  private val dividerRewardSql = {
    def f(re: String) =
      s"(length(list_filter(regexp_split_to_array(text, '\\n'), l -> regexp_matches(trim(l), '$re'))) > 0)"
    val (f1, f2, f3, f4) = (f("^-{3,}$"), f("^={3,}$"), f("^\\*{3,}$"), f("^~{3,}$"))
    s"""CAST(CASE WHEN (doc_id % 4 = 0 AND $f1) OR (doc_id % 4 = 1 AND $f2)
       |    OR (doc_id % 4 = 2 AND $f3) OR (doc_id % 4 = 3 AND $f4) THEN 1000000
       |  WHEN $f1 OR $f2 OR $f3 OR $f4 THEN 300000
       |  ELSE 0 END AS BIGINT)""".stripMargin
  }

  /** rw_cjk per training/rewards/language.py:6-13 (0 if CJK present). */
  private def cjkRewardPpm: Column =
    when(hasCjk(t), lit(0L)).otherwise(lit(1000000L))

  private val cjkRewardSql =
    """CAST(CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 0 ELSE 1000000 END AS BIGINT)"""

  /** rw_structure per training/rewards/structure.py:8-70; requested =
    * doc_id % 3 over [short, long, balanced]. Sentence-length sums/squares
    * are integer-exact before the double avg/variance. */
  private def structureRewardPpm(st: Column): Column = {
    val n = st.getField("sent_n").cast("long")
    val nD = greatest(n, lit(1L)).cast("double")
    val avg = st.getField("sent_sum").cast("double") / nD
    val variance = st.getField("sent_sumsq").cast("double") / nD - avg * avg
    val req = col("doc_id") % 3
    when(n < 2, lit(300000L))
      .when(req === 0, // short
        when(avg < 10, 1000000L).when(avg < 15, 700000L)
          .when(avg < 20, 400000L).otherwise(200000L))
      .when(req === 1, // long
        when(avg > 20, 1000000L).when(avg > 15, 700000L)
          .when(avg > 10, 400000L).otherwise(200000L))
      .otherwise( // balanced
        when(avg >= 10 && avg <= 20 && variance > 20, 1000000L)
          .when(avg >= 10 && avg <= 20, 700000L)
          .when(variance > 20, 600000L).otherwise(400000L))
  }

  private val structureRewardSql = {
    val lens = "[CAST(length(list_filter(regexp_split_to_array(s, '\\s+'), x -> x != '')) AS BIGINT) FOR s IN list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '')]"
    val n = s"CAST(length($lens) AS BIGINT)"
    val sumL = s"CAST(list_sum($lens) AS BIGINT)"
    val sumSq = s"CAST(list_sum([v*v FOR v IN $lens]) AS BIGINT)"
    val avg = s"(CAST($sumL AS DOUBLE) / CAST($n AS DOUBLE))"
    val vr = s"(CAST($sumSq AS DOUBLE) / CAST($n AS DOUBLE) - $avg * $avg)"
    s"""CAST(CASE WHEN $n < 2 THEN 300000
       |  WHEN doc_id % 3 = 0 THEN
       |    CASE WHEN $avg < 10 THEN 1000000 WHEN $avg < 15 THEN 700000
       |         WHEN $avg < 20 THEN 400000 ELSE 200000 END
       |  WHEN doc_id % 3 = 1 THEN
       |    CASE WHEN $avg > 20 THEN 1000000 WHEN $avg > 15 THEN 700000
       |         WHEN $avg > 10 THEN 400000 ELSE 200000 END
       |  ELSE
       |    CASE WHEN $avg >= 10 AND $avg <= 20 AND $vr > 20 THEN 1000000
       |         WHEN $avg >= 10 AND $avg <= 20 THEN 700000
       |         WHEN $vr > 20 THEN 600000 ELSE 400000 END END AS BIGINT)""".stripMargin
  }

  /** rw_emoji_variety per training/rewards/emoji_variety.py:5-20
    * (distinct/total emoji ratio bins; integer cross-multiplication keeps
    * both engines exact at the bin edges). */
  private def emojiVarietyRewardPpm(st: Column): Column = {
    val total = st.getField("emo_total").cast("long")
    val uniq = st.getField("emo_distinct").cast("long")
    when(total === 0, lit(0L))
      .when(uniq * 10 >= total * 9, lit(1000000L))
      .when(uniq * 10 >= total * 7, lit(800000L))
      .when(uniq * 2 >= total, lit(600000L))
      .otherwise(lit(400000L))
  }

  private val emojiVarietyRewardSql = {
    val emos = s"regexp_extract_all(text, '$EmojiClass')"
    s"""CAST(CASE WHEN length($emos) = 0 THEN 0
       |  WHEN length(list_distinct($emos)) * 10 >= length($emos) * 9 THEN 1000000
       |  WHEN length(list_distinct($emos)) * 10 >= length($emos) * 7 THEN 800000
       |  WHEN length(list_distinct($emos)) * 2 >= length($emos) THEN 600000
       |  ELSE 400000 END AS BIGINT)""".stripMargin
  }

  private val NewsletterRe =
    "(?i)(sign\\s*up|subscribe|join).{0,30}(newsletter)|(register|join).{0,30}(webinar|event)|link in (bio|profile|comments)"
  private val ActionRe =
    "(?i)link in (bio|comments|description)|dm me for|email me at|call (me|us) at|limited time offer|exclusive (deal|offer)"

  /** rw_fabrication per training/rewards/fabrication.py:52-113 — the
    * deterministic per-row subset (URL injection 0.7, promo phrases 0.3,
    * action phrases 0.4; the NER-based name/org checks need a language
    * model and are out of deterministic scope). */
  private def fabricationRewardPpm: Column = {
    val p = when(urlCount(t) > 0, lit(700000L)).otherwise(lit(0L)) +
      when(t.rlike(NewsletterRe), lit(300000L)).otherwise(lit(0L)) +
      when(t.rlike(ActionRe), lit(400000L)).otherwise(lit(0L))
    greatest(lit(0L), lit(1000000L) - p)
  }

  private val fabricationRewardSql =
    s"""CAST(GREATEST(0, 1000000
       |  - (CASE WHEN length(regexp_extract_all(text, 'https?://\\S+')) > 0 THEN 700000 ELSE 0 END)
       |  - (CASE WHEN regexp_matches(text, '$NewsletterRe') THEN 300000 ELSE 0 END)
       |  - (CASE WHEN regexp_matches(text, '$ActionRe') THEN 400000 ELSE 0 END)) AS BIGINT)""".stripMargin

  /** rw_bullets per training/rewards/bullet_style.py:36-40 (no requested
    * style in the synthesized requirement → 1.0 iff any bullet style is
    * detected, via the same line classifiers as p17). */
  private def bulletRewardPpm(st: Column): Column =
    when(st.getField("bullet_any"), lit(1000000L)).otherwise(lit(0L))

  private val bulletRewardSql = {
    def has(re: String) =
      s"length(list_filter(regexp_split_to_array(text, '\\n'), l -> regexp_matches(l, '$re'))) > 0"
    s"""CAST(CASE WHEN ${has("^\\s*[0-9]+[.)]\\s+")} OR ${has("^\\s*[A-Za-z][.)]\\s+")}
       |  OR ${has("^\\s*[-*•]\\s+")} OR contains(text, '•') THEN 1000000 ELSE 0 END AS BIGINT)""".stripMargin
  }

  /** rw_topic_shifts per training/rewards/topics.py:12-31 — the spaCy
    * paragraph-similarity re-expressed as adjacent-paragraph token
    * Jaccard (deterministic, same dataflow): <3 sentences → 0.5, else
    * 1 - |0.5 - avg adjacent similarity|. */
  private def topicShiftRewardPpm(st: Column): Column =
    when(st.getField("sent_n") < 3, lit(500000L))
      .otherwise(lit(1000000L) - abs(lit(500000L) - st.getField("sim_avg_ppm")))

  private val topicShiftRewardSql = {
    val paras = "list_filter(regexp_split_to_array(text, '\\n\\n'), p -> trim(p) != '')"
    def toksOf(p: String) =
      s"list_distinct(list_filter(regexp_split_to_array($p, '\\s+'), x -> x != ''))"
    val inter = s"len(list_intersect(${toksOf(s"$paras[i-1]")}, ${toksOf(s"$paras[i]")}))"
    val uni = s"(len(${toksOf(s"$paras[i-1]")}) + len(${toksOf(s"$paras[i]")}) - $inter)"
    val sims = s"[CASE WHEN $uni > 0 THEN $inter * 1000000 // $uni ELSE 1000000 END FOR i IN range(2, len($paras) + 1)]"
    val sentCount =
      "length(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != ''))"
    s"""CAST(CASE WHEN $sentCount < 3 THEN 500000
       |  ELSE 1000000 - abs(500000 - (CASE WHEN len($sims) > 0
       |    THEN CAST(list_sum($sims) AS BIGINT) // len($sims) ELSE 500000 END)) END AS BIGINT)""".stripMargin
  }

  /** rw_tone per training/rewards/tone.py:7-40 — required tone category
    * synthesized from doc_id % 3 (positive/neutral/negative; the
    * reference's tone_map image); the VADER sentiment arc is re-expressed
    * as the deterministic lexicon arc from [[graft.functions.Kernels
    * .rewardStats]] (0 Neutral / 1 Rising / 2 Falling / 3 Flat /
    * 4 Variable). */
  private def toneRewardPpm(st: Column): Column = {
    val arc = st.getField("arc")
    when(col("doc_id") % 3 === 0, when(arc === 1, lit(1000000L)).otherwise(lit(600000L)))
      .when(col("doc_id") % 3 === 2, when(arc === 2, lit(1000000L)).otherwise(lit(600000L)))
      .otherwise(when(arc === 0 || arc === 3, lit(1000000L)).otherwise(lit(600000L)))
  }

  /** rw_narrative per training/rewards/narrative.py:6-22: +0.4 when
    * pacing has data (>=3 sentences), +0.3 when the sentiment arc shows
    * movement (not Neutral/Flat), +0.3 when flow is smooth (<=1
    * adjacent-sentence keyword transitions). */
  private def narrativeRewardPpm(st: Column): Column = {
    val n = st.getField("sent_n")
    val arc = st.getField("arc")
    when(n >= 3, lit(400000L)).otherwise(lit(0L)) +
      when(arc =!= 0 && arc =!= 3, lit(300000L)).otherwise(lit(0L)) +
      when(n >= 3 && st.getField("flow_transitions") <= 1, lit(300000L)).otherwise(lit(0L))
  }

  /** rw_semantic per training/rewards/semantic.py:8-26: no sentences 0.5,
    * 1-2 sentences 0.6, else 0.5 + 0.25 (pacing has data) + 0.25 when the
    * arc shows movement. */
  private def semanticRewardPpm(st: Column): Column = {
    val arc = st.getField("arc")
    when(st.getField("sent_n") === 0, lit(500000L))
      .when(st.getField("sent_n") < 3, lit(600000L))
      .otherwise(lit(750000L) + when(arc =!= 0 && arc =!= 3, lit(250000L)).otherwise(lit(0L)))
  }

  private val allRewardCols = Seq(
    "r_length", "r_hashtags", "r_emoji", "r_punct", "r_linebreaks",
    "r_vocab", "r_divider", "r_cjk", "r_structure", "r_emoji_variety",
    "r_fabrication", "r_bullets", "r_topic_shifts", "r_tone",
    "r_narrative", "r_semantic")

  /** training/rewards/weights.example.json doubled to integers (0.5 → 1,
    * default 1.0 → 2) so the weighted mean is exact integer arithmetic in
    * both engines: structure and coherence (≈ r_semantic) at half weight,
    * everything else per `weights.get(name, 1.0)`. */
  private val weightX2: Map[String, Long] =
    Map("r_structure" -> 1L, "r_semantic" -> 1L).withDefaultValue(2L)

  private def weightedTotalExpr: String = {
    val terms = allRewardCols.map(c => s"$c * ${weightX2(c)}L").mkString(" + ")
    val wsum = allRewardCols.map(weightX2).sum
    s"($terms) div ${wsum}L"
  }

  private def weightedTotalSql: String = {
    val terms = allRewardCols.map(c => s"$c * ${weightX2(c)}").mkString(" + ")
    val wsum = allRewardCols.map(weightX2).sum
    s"($terms) // $wsum"
  }

  /** rw_rewards: all 16 reward columns + the uniform-weight aggregate
    * (training/rewards/aggregator.py re-expressed with equal weights).
    * The HOF-heavy statistics come from one native [[graft.functions
    * .NativeExpressions.RewardStats]] pass shared across columns. */
  def rwRewards(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.presentSorted(rwRewardsCore(spark, sfDir), col("doc_id"))

  /** The reward projection without the presentation sort — [[rwReport]]
    * aggregates this directly (a sort under an aggregate is either dead
    * weight or, if Catalyst keeps it, a full extra shuffle). */
  private def rwRewardsCore(spark: SparkSession, sfDir: String): DataFrame = {
    val st = col("st")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), t,
        graft.functions.NativeExpressions.rewardStats(t).as("st"))
      .select(col("doc_id"),
        lengthRewardPpm.as("r_length"),
        hashtagRewardPpm(st).as("r_hashtags"),
        emojiRewardPpm(st).as("r_emoji"),
        punctRewardPpm(st).as("r_punct"),
        linebreakRewardPpm(st).as("r_linebreaks"),
        vocabRewardPpm(st).as("r_vocab"),
        dividerRewardPpm(st).as("r_divider"),
        cjkRewardPpm.as("r_cjk"),
        structureRewardPpm(st).as("r_structure"),
        emojiVarietyRewardPpm(st).as("r_emoji_variety"),
        fabricationRewardPpm.as("r_fabrication"),
        bulletRewardPpm(st).as("r_bullets"),
        topicShiftRewardPpm(st).as("r_topic_shifts"),
        toneRewardPpm(st).as("r_tone"),
        narrativeRewardPpm(st).as("r_narrative"),
        semanticRewardPpm(st).as("r_semantic"))
      .withColumn("r_total",
        expr(s"(${allRewardCols.mkString(" + ")}) div ${allRewardCols.length}"))
      .withColumn("r_total_weighted", expr(weightedTotalExpr))
  }

  /** rw_report: the reward-evaluation REPORT (scripts/evaluate_rewards.py's
    * operational surface): per-reward corpus aggregates — count, integer
    * mean, min/max, median — over every reward column plus both totals.
    *
    * Shape (round 7): aggregate WIDE, then unpivot the one-row result —
    * ONE grouping-less aggregate computes all 18×(count/mean/min/max/p50)
    * columns in a single corpus pass with map-side partials, and the
    * stack runs over the single result row (driver-trivial). The r6
    * shape stacked FIRST, manufacturing 18×N unpivoted rows that all
    * went through the shuffle; this one shuffles only per-partition
    * aggregate buffers. The median routes through
    * [[graft.functions.Quantiles.pctl]]: exact percentile buffers the
    * column's values (×18 columns here — the grouping-less merge lands
    * on one reducer), so at 100 TB flip the approx knob: the same call
    * sites become bounded t-digest-style sketches and the single-reducer
    * merge is sketch-sized, not corpus-sized. */
  def rwReport(spark: SparkSession, sfDir: String): DataFrame = {
    val names = allRewardCols ++ Seq("r_total", "r_total_weighted")
    val aggs = names.zipWithIndex.flatMap { case (n, i) => Seq(
      expr(s"sum($n) div count(*)").as(s"mean_$i"),
      min(col(n)).as(s"min_$i"),
      max(col(n)).as(s"max_$i"),
      round(graft.functions.Quantiles.pctl(spark, n, 0.5), 0)
        .cast("long").as(s"p50_$i"))
    }
    val wide = rwRewardsCore(spark, sfDir)
      .agg(count(lit(1)).as("n_all"), aggs: _*)
    val stackArgs = names.zipWithIndex.map { case (n, i) =>
      s"'$n', n_all, mean_$i, min_$i, max_$i, p50_$i"
    }.mkString(", ")
    wide.select(expr(s"stack(${names.length}, $stackArgs) " +
        "AS (reward, n, mean_ppm, min_ppm, max_ppm, p50_ppm)"))
      // a grouping-less agg yields one row even over an EMPTY corpus;
      // the grouped oracle yields zero — drop the n=0 fan-out for parity
      .filter(col("n") > 0)
      .orderBy(col("reward"))
  }


  // ---- arc / flow DuckDB machinery (mirrors Kernels.rewardStats) ----

  private[operators] val sentsSql =
    "list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '')"

  private[operators] def sentToksSql(s: String) =
    s"list_filter(regexp_split_to_array($s, '\\s+'), x -> x != '')"

  private def wordListSql(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private[operators] val scoresSql = {
    val pos = wordListSql(graft.functions.Kernels.PosWords)
    val neg = wordListSql(graft.functions.Kernels.NegWords)
    s"""[CAST(len(list_filter(${sentToksSql("s")}, x -> list_contains($pos, x))) AS BIGINT)
       | - CAST(len(list_filter(${sentToksSql("s")}, x -> list_contains($neg, x))) AS BIGINT)
       | FOR s IN $sentsSql]""".stripMargin
  }

  /** Sentiment-arc code over the per-sentence lexicon scores: 0 Neutral
    * (<3 sentences) / 1 Rising / 2 Falling / 3 Flat / 4 Variable;
    * middle = scores[n/2] zero-based == scores[n//2 + 1] one-based. */
  private val arcSql =
    """CASE WHEN len(scores) < 3 THEN 0
      |  WHEN scores[1] < scores[len(scores)//2 + 1]
      |    AND scores[len(scores)//2 + 1] < scores[len(scores)]
      |    AND scores[len(scores)] > 0 THEN 1
      |  WHEN scores[1] > scores[len(scores)//2 + 1]
      |    AND scores[len(scores)//2 + 1] > scores[len(scores)]
      |    AND scores[len(scores)] < 0 THEN 2
      |  WHEN scores[len(scores)] = scores[1]
      |    AND scores[len(scores)//2 + 1] = 0 THEN 3
      |  ELSE 4 END""".stripMargin

  private[operators] val flowTransitionsSql =
    s"""len(list_filter(range(2, len(sents) + 1), i ->
       |  len(list_intersect(list_distinct(${sentToksSql("sents[i-1]")}),
       |      list_distinct(${sentToksSql("sents[i]")}))) < 2))""".stripMargin

  private val toneRewardSql =
    """CAST(CASE WHEN doc_id % 3 = 0 THEN CASE WHEN arc = 1 THEN 1000000 ELSE 600000 END
      |  WHEN doc_id % 3 = 2 THEN CASE WHEN arc = 2 THEN 1000000 ELSE 600000 END
      |  ELSE CASE WHEN arc = 0 OR arc = 3 THEN 1000000 ELSE 600000 END END AS BIGINT)""".stripMargin

  private val narrativeRewardSql =
    """CAST((CASE WHEN n_sents >= 3 THEN 400000 ELSE 0 END)
      |  + (CASE WHEN arc != 0 AND arc != 3 THEN 300000 ELSE 0 END)
      |  + (CASE WHEN n_sents >= 3 AND flow_transitions <= 1 THEN 300000 ELSE 0 END) AS BIGINT)""".stripMargin

  private val semanticRewardSql =
    """CAST(CASE WHEN n_sents = 0 THEN 500000 WHEN n_sents < 3 THEN 600000
      |  ELSE 750000 + CASE WHEN arc != 0 AND arc != 3 THEN 250000 ELSE 0 END END AS BIGINT)""".stripMargin

  /** The constraint-extraction projection over a prompt column — ONE
    * definition shared by batch [[rwPromptParse]] and the streaming
    * ingest gate (EventStreams.promptConstraintGate), so the two forms
    * cannot drift. */
  def promptConstraintCols(prompt: Column): Seq[Column] = Seq(
    regexp_extract(prompt, "^Write a (.+?) social media post", 1)
      .as("structure_req"),
    regexp_extract(prompt, "about \"([^\"]*)\"", 1).as("topic"),
    regexp_extract(prompt, "in a (.+) tone\\.", 1).as("tone_req"),
    regexp_extract(prompt, "\\*\\*Length\\*\\*: ([^\\n]+)", 1).as("length_req"),
    regexp_extract(prompt, "\\*\\*Emoji Usage\\*\\*: ([^\\n]+)", 1).as("emoji_req"))

  /** rw_prompt_parse: parse the formatted generation prompt BACK into
    * the constraint fields the reward loop reads
    * (training/grpo/prompt_parsing.py:122-160 parse_writing_style_block
    * + :20-23 extract_prompt_content's topic line — regex extraction
    * over the markdown prompt), plus the completion-side URL count
    * (prompt_parsing.py:163-165 detect_urls) the fabrication reward
    * consumes. Runs over this engine's own p18 prompt column so the
    * round-trip (assemble → parse) is closed and oracle-checkable.
    *
    * Scale shape: map-only, shuffle-free, all codegen'd regexp_extract —
    * a pure scan at 100 TB. */
  def rwPromptParse(spark: SparkSession, sfDir: String): DataFrame =
    Style.promptFrame(spark, sfDir)
      .select(col("doc_id") +: promptConstraintCols(col("prompt"))
        :+ urlCount(t).cast("long").as("n_urls"): _*)
      .transform(Sampling.presentSorted(_, col("doc_id")))

  private val promptParseSql =
    s"""WITH p AS (
       |  SELECT doc_id, ${Style.genPromptSql} AS prompt, text
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_extract(prompt, '^Write a (.+?) social media post', 1) AS structure_req,
       |  regexp_extract(prompt, 'about "([^"]*)"', 1) AS topic,
       |  regexp_extract(prompt, 'in a (.+) tone\\.', 1) AS tone_req,
       |  regexp_extract(prompt, '\\*\\*Length\\*\\*: ([^\\n]+)', 1) AS length_req,
       |  regexp_extract(prompt, '\\*\\*Emoji Usage\\*\\*: ([^\\n]+)', 1) AS emoji_req,
       |  CAST(len(regexp_extract_all(text, 'https?://\\S+')) AS BIGINT) AS n_urls
       |FROM p ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rw_rewards"      -> (rwRewards _),
    "rw_report"       -> (rwReport _),
    "rw_prompt_parse" -> (rwPromptParse _))

  /** Shared oracle CTE: a/b feature extraction, r per-reward columns,
    * rr the full per-doc reward projection both queries read. */
  private def rrCteSql: String =
      s"""WITH a AS (
         |  SELECT doc_id, text, $scoresSql AS scores, $sentsSql AS sents
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, text, $arcSql AS arc, len(sents) AS n_sents,
         |    $flowTransitionsSql AS flow_transitions
         |  FROM a),
         |r AS (
         |  SELECT doc_id,
         |    $lengthRewardSql AS r_length,
         |    $hashtagRewardSql AS r_hashtags,
         |    $emojiRewardSql AS r_emoji,
         |    $punctRewardSql AS r_punct,
         |    $linebreakRewardSql AS r_linebreaks,
         |    $vocabRewardSql AS r_vocab,
         |    $dividerRewardSql AS r_divider,
         |    $cjkRewardSql AS r_cjk,
         |    $structureRewardSql AS r_structure,
         |    $emojiVarietyRewardSql AS r_emoji_variety,
         |    $fabricationRewardSql AS r_fabrication,
         |    $bulletRewardSql AS r_bullets,
         |    $topicShiftRewardSql AS r_topic_shifts,
         |    $toneRewardSql AS r_tone,
         |    $narrativeRewardSql AS r_narrative,
         |    $semanticRewardSql AS r_semantic
         |  FROM b),
         |rr AS (
         |  SELECT doc_id, ${allRewardCols.mkString(", ")},
         |    (${allRewardCols.mkString(" + ")}) // ${allRewardCols.length} AS r_total,
         |    $weightedTotalSql AS r_total_weighted
         |  FROM r)""".stripMargin

  val oracle: Map[String, String] = Map(
    "rw_rewards" ->
      s"""$rrCteSql
         |SELECT doc_id, ${allRewardCols.mkString(", ")}, r_total, r_total_weighted
         |FROM rr ORDER BY doc_id""".stripMargin,
    "rw_report" -> {
      val names = (allRewardCols ++ Seq("r_total", "r_total_weighted")).mkString(", ")
      s"""$rrCteSql,
         |u AS (SELECT reward, v FROM rr UNPIVOT (v FOR reward IN ($names)))
         |SELECT reward, count(*) AS n,
         |  CAST(sum(v) // count(*) AS BIGINT) AS mean_ppm,
         |  min(v) AS min_ppm, max(v) AS max_ppm,
         |  CAST(round(quantile_cont(v, 0.5), 0) AS BIGINT) AS p50_ppm
         |FROM u GROUP BY reward ORDER BY reward""".stripMargin
    },
    "rw_prompt_parse" -> promptParseSql)
}
