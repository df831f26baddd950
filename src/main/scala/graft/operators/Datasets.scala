package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Dataset assembly, deterministic split, and DPO negative injection
  * (reference stages 22-generate-dataset.py, 23-split.py,
  * 24-add-negatives.py + utils/violations.py).
  *
  * All three are oracle-checkable: the reference's RNG choices (fake-URL
  * chars, name picks, shuffles, sampling) are re-expressed as content
  * hashing per SURVEY §5.
  *
  * Scale shape (100 TB): p22 is a shuffle-free explode (5 output rows per
  * document); p24 is a shuffle-free projection; p23's per-group exact
  * 80/20 split uses [[Sampling.hashRank]] (bucketed rank — no per-group
  * global sort) plus a broadcast of the tiny per-group count table.
  */
object Datasets {

  /** 22-generate-dataset.py:119 — the standardized system message. */
  val SystemMessage: String =
    "Below is an instruction from the user that describes a task. It is " +
      "crucial to avoid making up any facts or mentioning entities that " +
      "are not explicitly stated in the instruction. Strictly adhere to " +
      "the information provided and do not introduce any external or " +
      "irrelevant details."

  // ---- prompt templates (22-generate-dataset.py:20-97), split around
  // the embedded post text so Spark and DuckDB concat identically ----

  private val topicPre =
    "## Prompt\nAnalyze the following social media post and identify its primary topic **in a single phrase or sentence**.\n\n### Content to Analyze\n```\n"
  private val topicPost =
    "\n```\n\n### Writing Constraints\n- **Response Type**: Topic classification\n- **Format**: Single phrase or short sentence\n- **Tone**: Analytical, objective\n- **Length**: Keep your response under 10 words\n"

  private val opinionPre =
    "# Request\nExtract the core opinion from this social media post and present it in first person.\n\n## Content to Analyze\n```\n"
  private val opinionPost =
    "\n```\n\n## Writing Constraints\n- **Response Type**: Opinion statement\n- **Format**: First-person perspective\n- **Tone**: Match the author's voice\n- **Length**: One or two sentences\n"

  private val tonePre =
    "# Request\nAnalyze this social media post and identify up to three primary tones from the provided list.\n\n## Content to Analyze\n```\n"
  private val tonePost =
    "\n```\n\n## Available Tones\n" +
      Annotations.Tones.map(_.capitalize).mkString(", ") + ".\n\n" +
      "## Writing Constraints\n- **Response Type**: Tone classification\n- **Format**: Comma-separated list\n- **Maximum Selections**: Three tones\n- **Prohibited**: No explanations or additional text\n"

  private val structurePre =
    "# Request\nClassify the structural format of this social media post using the provided categories.\n\n## Content to Analyze\n```\n"
  private val structurePost =
    "\n```\n\n## Structure Categories\n- **Instructional**: Posts offering practical, step-by-step advice\n- **Inspirational**: Posts that share success stories or words of encouragement\n- **Controversial**: Posts that challenge conventional wisdom or popular opinion\n- **Insightful**: Posts sharing thoughts on current events or industry changes\n- **Comparative**: Posts that compare two or more things\n- **Reflective**: Posts reflecting on past experiences\n- **Announcement**: Posts that grow excitement for something new\n\n## Writing Constraints\n- **Response Type**: Structure classification\n- **Format**: Single word (category name only)\n- **Required**: Choose exactly one category\n"

  /** SQL string literal with quote-doubling (templates contain '). */
  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private val t = col("text")

  /** p22: chosen/prompt pair assembly — one output row per (document,
    * prompt family), five families: topic / opinion / tone / structure
    * classification plus post-generation (22-generate-dataset.py:141-184).
    * Shuffle-free: annotations are computed inline and exploded. */
  def p22Dataset(spark: SparkSession, sfDir: String): DataFrame = {
    def fam(name: String, prompt: Column, chosen: Column): Column =
      struct(lit(name).as("family"), prompt.as("prompt"), chosen.as("chosen"))
    // Annotations materialize ONCE below the explode — each md5/token
    // pipeline runs per document, not per (document, family) reference;
    // the tokenizer/emoji kernels stage first so the structure/usage
    // `when` chains read attributes (one kernel pass per row each).
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), t, tokens(t).as("__toks"),
        emojiCount(t).cast("long").as("__ne"))
      .select(col("doc_id"), t,
        Annotations.topicCol.as("__topic"),
        Annotations.opinionColOf(col("__toks")).as("__opinion"),
        Annotations.toneCol.as("__tone"),
        Annotations.structureColOf(col("__toks")).as("__structure"),
        emojiUsageOf(col("__ne"), length(t)).as("__usage"))
      .select(col("doc_id"), explode(array(
        fam("topic", concat(lit(topicPre), t, lit(topicPost)), col("__topic")),
        fam("opinion", concat(lit(opinionPre), t, lit(opinionPost)), col("__opinion")),
        fam("tone", concat(lit(tonePre), t, lit(tonePost)), col("__tone")),
        fam("structure", concat(lit(structurePre), t, lit(structurePost)), col("__structure")),
        fam("post-generation",
          Style.genPromptFrom(col("__structure"), col("__topic"), col("__tone"), t,
            col("__usage")),
          t))).as("f"))
      .select(col("doc_id"), col("f.family"), lit(SystemMessage).as("system"),
        col("f.prompt"), col("f.chosen"))
      .orderBy(col("doc_id"), col("family"))
  }

  /** Split-group key: post-generation rows group by structure, the rest by
    * prompt family (23-split.py:496-509). `structure` should be a
    * materialized attribute (staging keeps the tokenizer to one pass
    * per document rather than one per family row and `when` branch). */
  private def groupKeyCol(family: Column, structure: Column): Column =
    when(family === "post-generation",
      concat(lit("post-"), structure)).otherwise(family)

  /** p23: deterministic per-group 80/20 SFT/DPO split
    * (23-split.py:514-521: per-group shuffle + int(n*0.80) to SFT — the
    * shuffle re-expressed as md5 ordering, the float 0.80 as exact
    * integer (4n div 5)). */
  def p23Split(spark: SparkSession, sfDir: String): DataFrame = {
    val fams = Seq("topic", "opinion", "tone", "structure", "post-generation")
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), t, tokens(t).as("__toks"))
      .select(col("doc_id"),
        Annotations.structureColOf(col("__toks")).as("__structure"),
        explode(array(fams.map(lit): _*)).as("family"))
      .select(col("doc_id"), col("family"),
        groupKeyCol(col("family"), col("__structure")).as("group_key"))
    val bucketed = Sampling.withBuckets(base,
      md5(concat(lit("split#"), col("doc_id").cast("string"), lit("#"), col("family"))))
    val bCounts = Sampling.bucketCounts(bucketed, Seq("group_key"))
    // group totals from the tiny bucket-count table — no second base scan
    val counts = bCounts.groupBy("group_key").agg(sum(col("__cnt")).as("__cnt"))
    val ranked = Sampling.rankFromCounts(bucketed, bCounts, Seq("group_key"),
      col("doc_id"), "__rn")
    ranked.join(broadcast(counts), "group_key")
      .select(col("doc_id"), col("family"), col("group_key"),
        when(col("__rn") <= expr("(__cnt * 4) div 5"), "sft")
          .otherwise("dpo").as("split"))
      .orderBy(col("doc_id"), col("family"))
  }

  /** Names pool from utils/violations.py:violate_names. */
  private[graft] val Names =
    Seq("John Doe", "Jane Smith", "Alex Johnson", "Chris Lee")

  /** Emoji pool (subset of utils/violations.py:EMOJI). */
  private val NegEmoji = Seq("😀", "😃", "😄",
    "😁", "😆", "😅", "😂", "😊")

  /** p24: DPO negative injection over post-generation rows — the chosen
    * text with constraint violations appended/applied in the reference's
    * order (utils/violations.py:generate_negative): fake URL, name
    * shout-out, emoji spam when the prompt demands low emoji usage,
    * hashtag spam, then a length violation (overflow for "up to" prompts,
    * truncation for "between" prompts). Random picks (URL chars, names,
    * emoji) are md5-derived. Shuffle-free single-pass projection. */
  def p24Negatives(spark: SparkSession, sfDir: String): DataFrame =
    negativesFrame(spark, sfDir)
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** [[p24Negatives]] without the presentation checkpoint+sort — the form
    * downstream composers (rw_entities' detection pass) build on. */
  private[graft] def negativesFrame(
      spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), t, emojiCount(t).cast("long").as("__ne"))
      .select(col("doc_id"), t,
        emojiUsageOf(col("__ne"), length(t)).as("__eu"),
        lengthBucket(t).as("__lb"))
      // violate_urls: deterministic 8-char path from md5 (violations.py:29-31)
      .withColumn("__s1", concat(t, lit("\n\nLearn more: https://lnkd.in/"),
        substring(md5(concat(lit("url#"), col("doc_id").cast("string"))), 1, 8)))
      // violate_names (violations.py:34-36)
      .withColumn("__s2", concat(col("__s1"), lit("\n\nShout out to "),
        element_at(array(Names.map(lit): _*),
          (hashBucket(concat(lit("name#"), t), Names.length) + 1).cast("int")),
        lit("!")))
      // violate_emoji when usage is constrained low (violations.py:16-21;
      // reference checks none|infrequent — maps to this taxonomy's
      // none|very low)
      .withColumn("__s3", when(col("__eu").isin("none", "very low"),
        concat(col("__s2"), lit("\n\n"),
          repeat(element_at(array(NegEmoji.map(lit): _*),
            (hashBucket(concat(lit("emo#"), t), NegEmoji.length) + 1).cast("int")), 10)))
        .otherwise(col("__s2")))
      // violate_hashtags: rstrip + 6 tags (violations.py:24-26, count=max(6,3+3))
      // engine-shared \s set (see Kernels.isWsChar): not \x0B
      .withColumn("__s4", concat(regexp_replace(col("__s3"), "[ \t\n\f\r]+$", ""),
        lit("\n\n#tag0 #tag1 #tag2 #tag3 #tag4 #tag5")))
      // violate_length (violations.py:8-13): over = filler * max(1, len//120);
      // under = first max(1, len//2) chars
      .withColumn("rejected", when(col("__lb").startsWith("Up to"),
        concat(col("__s4"), expr(
          "repeat(' Lorem ipsum dolor sit amet.', greatest(1, length(__s4) div 120))")))
        .otherwise(expr("substring(__s4, 1, greatest(1, length(__s4) div 2))")))
      .select(col("doc_id"), t.as("chosen"), col("rejected"))

  /** p24_dpo_ready: the reference pipeline's final artifact
    * (24-dpo-ready) — the DPO split of the assembled dataset with
    * violation negatives attached to post-generation rows. Pure
    * composition of p22 ⋈ p23 ⋈ p24 on (doc_id, family): the stages
    * chain as plan builders, no materialization between them. */
  def p24DpoReady(spark: SparkSession, sfDir: String): DataFrame =
    p22Dataset(spark, sfDir)
      .join(p23Split(spark, sfDir).select(col("doc_id"), col("family"),
        col("group_key"), col("split")), Seq("doc_id", "family"))
      .join(p24Negatives(spark, sfDir).select(col("doc_id"), col("rejected")),
        Seq("doc_id"))
      .filter(col("split") === "dpo")
      .select(col("doc_id"), col("family"), col("group_key"), col("system"),
        col("prompt"), col("chosen"),
        when(col("family") === "post-generation", col("rejected")).as("rejected"))
      .orderBy(col("doc_id"), col("family"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p22_dataset"   -> (p22Dataset _),
    "p23_split"     -> (p23Split _),
    "p24_negatives" -> (p24Negatives _),
    "p24_dpo_ready" -> (p24DpoReady _))

  // ---- DuckDB oracle ----

  private val groupKeySql =
    s"CASE WHEN f = 'post-generation' THEN concat('post-', ${Annotations.structureSql}) ELSE f END"

  /** p24_dpo_ready oracle: the three stage oracles as CTEs, re-joined. */
  private def dpoReadySql(p22: String, p23: String, p24: String): String =
    s"""WITH a AS ($p22),
       |s AS ($p23),
       |n AS ($p24)
       |SELECT a.doc_id, a.family, s.group_key, a.system, a.prompt, a.chosen,
       |  CASE WHEN a.family = 'post-generation' THEN n.rejected END AS rejected
       |FROM a
       |JOIN s ON a.doc_id = s.doc_id AND a.family = s.family
       |JOIN n ON a.doc_id = n.doc_id
       |WHERE s.split = 'dpo'
       |ORDER BY a.doc_id, a.family""".stripMargin

  val oracle: Map[String, String] = {
    val base = oracleBase
    base + ("p24_dpo_ready" -> dpoReadySql(
      base("p22_dataset"), base("p23_split"), base("p24_negatives")))
  }

  private def oracleBase: Map[String, String] = Map(
    "p22_dataset" ->
      s"""WITH posts AS (
         |  SELECT doc_id, text,
         |    ${Annotations.topicSql} AS topic,
         |    ${Annotations.opinionSql} AS opinion,
         |    ${Annotations.toneInlineSql} AS tone,
         |    ${Annotations.structureSql} AS structure,
         |    ${Style.genPromptSql} AS gen_prompt
         |  FROM documents)
         |SELECT doc_id, family, ${sq(SystemMessage)} AS system, prompt, chosen FROM (
         |  SELECT doc_id, 'topic' AS family,
         |    concat(${sq(topicPre)}, text, ${sq(topicPost)}) AS prompt, topic AS chosen FROM posts
         |  UNION ALL
         |  SELECT doc_id, 'opinion', concat(${sq(opinionPre)}, text, ${sq(opinionPost)}), opinion FROM posts
         |  UNION ALL
         |  SELECT doc_id, 'tone', concat(${sq(tonePre)}, text, ${sq(tonePost)}), tone FROM posts
         |  UNION ALL
         |  SELECT doc_id, 'structure', concat(${sq(structurePre)}, text, ${sq(structurePost)}), structure FROM posts
         |  UNION ALL
         |  SELECT doc_id, 'post-generation', gen_prompt, text FROM posts)
         |ORDER BY doc_id, family""".stripMargin,
    "p23_split" ->
      s"""WITH base AS (
         |  SELECT doc_id, f AS family, $groupKeySql AS group_key
         |  FROM documents
         |  CROSS JOIN (VALUES ('topic'), ('opinion'), ('tone'), ('structure'), ('post-generation')) t(f)),
         |r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY group_key
         |      ORDER BY md5(concat('split#', CAST(doc_id AS VARCHAR), '#', family)), doc_id) AS rn,
         |    count(*) OVER (PARTITION BY group_key) AS cnt
         |  FROM base)
         |SELECT doc_id, family, group_key,
         |  CASE WHEN rn <= (cnt * 4) // 5 THEN 'sft' ELSE 'dpo' END AS split
         |FROM r ORDER BY doc_id, family""".stripMargin,
    "p24_negatives" -> {
      val namesSql = Names.map(n => s"'$n'").mkString("[", ", ", "]")
      val emojiSql = NegEmoji.map(e => s"'$e'").mkString("[", ", ", "]")
      s"""WITH d0 AS (
         |  SELECT doc_id, text,
         |    ${DocPipeline.emojiUsageSql} AS eu,
         |    ${DocPipeline.lengthBucketSql} AS lb
         |  FROM documents),
         |d1 AS (SELECT *, concat(text, ${sq("\n\nLearn more: https://lnkd.in/")},
         |  substr(md5(concat('url#', CAST(doc_id AS VARCHAR))), 1, 8)) AS s1 FROM d0),
         |d2 AS (SELECT *, concat(s1, ${sq("\n\nShout out to ")},
         |  $namesSql[(${hashBucketSql("concat('name#', text)", Names.length)}) + 1], '!') AS s2 FROM d1),
         |d3 AS (SELECT *, CASE WHEN eu IN ('none', 'very low')
         |  THEN concat(s2, ${sq("\n\n")},
         |    repeat($emojiSql[(${hashBucketSql("concat('emo#', text)", NegEmoji.length)}) + 1], 10))
         |  ELSE s2 END AS s3 FROM d2),
         |d4 AS (SELECT *, concat(regexp_replace(s3, '\\s+$$', ''),
         |  ${sq("\n\n#tag0 #tag1 #tag2 #tag3 #tag4 #tag5")}) AS s4 FROM d3)
         |SELECT doc_id, text AS chosen,
         |  CASE WHEN lb LIKE 'Up to%'
         |    THEN concat(s4, repeat(' Lorem ipsum dolor sit amet.', GREATEST(1, length(s4) // 120)))
         |    ELSE substr(s4, 1, GREATEST(1, length(s4) // 2)) END AS rejected
         |FROM d4 ORDER BY doc_id""".stripMargin
    })
}
