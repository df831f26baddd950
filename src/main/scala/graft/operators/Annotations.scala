package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Annotation + cleaning stages (reference stages 3/6/7/9/11/12/14/15).
  *
  * The reference runs these as vLLM guided-decoding classifiers; per
  * SURVEY §1.3 they are re-expressed as deterministic heuristic
  * classifiers with the same dataflow shape (same label taxonomies, same
  * downstream cleaning filters), so they stay oracle-checkable. All are
  * shuffle-free single-pass projections/filters.
  */
object Annotations {

  /** Taxonomy from 3-extract-structures.py:24-34. */
  val StructureLabels = Seq(
    "instructional", "inspirational", "analytical", "insightful",
    "controversial", "comparative", "reflective", "evolutionary",
    "announcement")

  /** Taxonomy from 9-extract-tone.py:24-100 (all 76 allowed tones). */
  val Tones = Seq(
    "adventurous", "artistic", "assertive", "authoritative", "bold",
    "bright", "calm", "capable", "caring", "casual", "charming", "cheerful",
    "clever", "cocky", "colorful", "comfortable", "conversational",
    "creative", "daring", "delightful", "detailed", "dramatic", "dry",
    "eccentric", "elegant", "endearing", "energetic", "engaging",
    "exciting", "fabulous", "fancy", "fierce", "formal", "friendly", "fun",
    "futuristic", "glamorous", "honorable", "industrial", "informative",
    "inspiring", "intense", "inviting", "lively", "natural", "no-nonsense",
    "persuasive", "playful", "powerful", "professional", "quirky",
    "rebellious", "reliable", "sarcastic", "savvy", "scholarly", "secure",
    "serious", "silly", "sleek", "smart", "soothing", "sophisticated",
    "stable", "stimulating", "strong", "swanky", "tasteful", "thoughtful",
    "trustworthy", "unconventional", "unique", "upbeat", "versatile",
    "whimsical", "witty")

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  private val t = col("text")
  private def toks = tokens(t)

  private def pick(labels: Seq[String], bucket: Column): Column =
    element_at(array(labels.map(lit): _*), (bucket + 1).cast("int"))

  private def pickSql(labels: Seq[String], bucketSql: String): String = {
    val lst = labels.map(l => s"'$l'").mkString("[", ", ", "]")
    s"$lst[($bucketSql) + 1]"
  }

  private val toksSql =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"

  /** Structure label from a PRE-COMPUTED token array — the staged form
    * hot paths use so the tokenizer kernel runs once per row; a `when`
    * chain re-evaluates a non-attribute token expression per branch
    * (codegen subexpression elimination does not cross conditional
    * branches — the 6×-tokenize p03 plan). */
  private[operators] def structureColOf(tks: Column): Column =
    when(length(trim(t)) === 0, "unknown")
      .when(array_contains(tks, "data") && array_contains(tks, "table"), "analytical")
      .when(array_contains(tks, "fast") && array_contains(tks, "slow"), "comparative")
      .when(array_contains(tks, "stream"), "evolutionary")
      .when(array_contains(tks, "spark"), "announcement")
      .otherwise(pick(StructureLabels, hashBucket(t, 9)))

  /** Structure label column (shared with p18's prompt assembly). */
  private[operators] def structureCol: Column = structureColOf(toks)

  /** p03: structure classification — keyword rules first, md5-bucket
    * fallback over the 9-label taxonomy; empty text → 'unknown'
    * (3-extract-structures.py:60-75 semantics, heuristic re-expression). */
  def p03Structure(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), t, toks.as("__toks"))
      .select(col("doc_id"), structureColOf(col("__toks")).as("structure"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p06: dominant-token topic (most frequent token, ties → smallest by
    * binary UTF-8 order) — a native one-pass expression; the DuckDB oracle
    * keeps the naive count-per-distinct-token argmin form and produces
    * identical values (asserted by NativeExpressionsSpec and the
    * correctness gate). */
  private[operators] def topicCol: Column =
    graft.functions.NativeExpressions.dominantToken(t)

  // Argmin sentinel 10^9 (pad 10): safe for any document under a billion
  // repeats of one token — far past plausible row width; the native
  // DominantToken kernel itself has no limit.
  private[operators] val topicSql =
    s"""substr(list_min([concat(lpad(CAST(1000000000 - len(list_filter($toksSql, tk -> tk = x)) AS VARCHAR), 10, '0'), x)
       |  FOR x IN list_distinct($toksSql)]), 11)""".stripMargin

  def p06Topic(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), topicCol.as("topic"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p07: drop topics with disallowed content (7-clean-topics.py:18-43:
    * "..."/?/_/{}/[]/<>/CJK/"unknown").
    *
    * The filter is expressed as a one-element higher-order
    * `explode(filter(array(topic), …))` rather than a Filter node: a
    * plain `.filter(isDisallowed(col("topic")))` gets pushed below the
    * projection with the alias INLINED into each of the predicate's 12
    * references, so the DominantToken kernel ran 13× per row (146 s at
    * the 100× corpus vs p06's 16 s for the same kernel once). Here the
    * kernel fills the array once and the lambda tests the materialized
    * element with the SAME Catalyst expressions (exact oracle parity);
    * a disallowed (or null, i.e. empty-doc) topic yields an empty array
    * and explode emits no row — identical row set. */
  def p07CleanTopics(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        explode(filter(array(topicCol),
          t => !isDisallowedAnnotation(t))).as("topic"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p09: tone — up to 3 distinct md5-bucketed picks from the 76-tone
    * taxonomy, joined ", " (9-extract-tone.py:154-163 join semantics). */
  private[operators] def toneCol: Column = {
    val n = Tones.length
    val t1 = pick(Tones, hashBucket(concat(t, lit("#1")), n))
    val t2 = pick(Tones, hashBucket(concat(t, lit("#2")), n))
    val t3 = pick(Tones, hashBucket(concat(t, lit("#3")), n))
    concat(t1,
      when(t2 =!= t1, concat(lit(", "), t2)).otherwise(lit("")),
      when(t3 =!= t1 && t3 =!= t2, concat(lit(", "), t3)).otherwise(lit("")))
  }

  def p09Tone(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), toneCol.as("tone"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p11: opinion extraction — leading-phrase re-expression ("I think " +
    * first 5 tokens); empty text → '' (11-extract-opinion.py:50,64-70).
    * Staged form: `tks` should be a materialized token attribute. */
  private[operators] def opinionColOf(tks: Column): Column =
    when(size(tks) === 0, "")
      .otherwise(concat(lit("I think "), concat_ws(" ", slice(tks, 1, 5))))

  private[operators] val opinionCol = opinionColOf(toks)

  private[operators] val opinionSql =
    s"""CASE WHEN len($toksSql) = 0 THEN ''
       |  ELSE concat('I think ', array_to_string(($toksSql)[1:5], ' ')) END""".stripMargin

  def p11Opinion(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), opinionColOf(col("__toks")).as("opinion"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p12: drop opinions with CJK or bare "unknown"
    * (12-clean-opinions.py:18-30). The predicate tests the five-token
    * payload directly — the "I think " prefix is pure ASCII and makes a
    * bare "unknown" impossible, so this is row-for-row identical to
    * filtering on the assembled opinion (the oracle keeps that form)
    * while filter pushdown re-evaluates only the payload, not the whole
    * CASE/concat chain. */
  def p12CleanOpinions(spark: SparkSession, sfDir: String): DataFrame =
    // one-element higher-order filter (the p07 pattern): a Filter node
    // would be pushed below the projection and re-derive the token
    // array from text inside the predicate
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode(filter(array(struct(
          opinionColOf(col("__toks")).as("opinion"),
          concat_ws(" ", slice(col("__toks"), 1, 5)).as("first5"))),
        s => !hasCjk(s("first5")))).as("__o"))
      .select(col("doc_id"), col("__o.opinion").as("opinion"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p14: context extraction — tokens 6-10 as the supporting-context
    * phrase; <6 tokens → 'Unknown' (14-extract-context.py:34-39,69-75).
    * Staged form: `tks` should be a materialized token attribute. */
  private def contextColOf(tks: Column): Column =
    when(size(tks) < 6, "Unknown")
      .otherwise(concat(lit("Based on "), concat_ws(" ", slice(tks, 6, 5))))

  private val contextSql =
    s"""CASE WHEN len($toksSql) < 6 THEN 'Unknown'
       |  ELSE concat('Based on ', array_to_string(($toksSql)[6:10], ' ')) END""".stripMargin

  def p14Context(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), contextColOf(col("__toks")).as("context"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** p15: drop contexts with CJK, bare "unknown", or the literal "650+"
    * (15-clean-context.py:18-39 — note the reference's `and` chain
    * short-circuits to a bare `"650+" in context` check; reproduced
    * faithfully). Component-level predicate: the <6-token branch yields
    * exactly "Unknown" (always dropped by the unknown test), and in the
    * "Based on " branch both the CJK and "650+" tests can only hit
    * inside the token payload ("650+" contains no space, so it cannot
    * span the ASCII prefix boundary) — row-for-row identical to
    * filtering the assembled context, which the oracle still does. */
  def p15CleanContext(spark: SparkSession, sfDir: String): DataFrame =
    // same one-element higher-order filter shape as p12
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode(filter(array(struct(
          contextColOf(col("__toks")).as("context"),
          size(col("__toks")).as("ntok"),
          concat_ws(" ", slice(col("__toks"), 6, 5)).as("mid"))),
        s => s("ntok") >= 6 &&
          !(hasCjk(s("mid")) || s("mid").contains("650+")))).as("__c"))
      .select(col("doc_id"), col("__c.context").as("context"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p03_structure"     -> (p03Structure _),
    "p06_topic"         -> (p06Topic _),
    "p07_clean_topics"  -> (p07CleanTopics _),
    "p09_tone"          -> (p09Tone _),
    "p11_opinion"       -> (p11Opinion _),
    "p12_clean_opinions" -> (p12CleanOpinions _),
    "p14_context"       -> (p14Context _),
    "p15_clean_context" -> (p15CleanContext _))

  // ---- DuckDB oracle ----

  private def tokenHas(w: String) = s"list_contains($toksSql, '$w')"

  /** Inline (subquery-free) DuckDB tone expression, for reuse in p18. */
  private[operators] def toneInlineSql: String = {
    val n = Tones.length
    def p(i: Int) = pickSql(Tones, hashBucketSql(s"concat(text, '#$i')", n))
    s"""concat(${p(1)},
       |  CASE WHEN ${p(2)} != ${p(1)} THEN concat(', ', ${p(2)}) ELSE '' END,
       |  CASE WHEN ${p(3)} != ${p(1)} AND ${p(3)} != ${p(2)} THEN concat(', ', ${p(3)}) ELSE '' END)""".stripMargin
  }

  private[operators] val structureSql =
    s"""CASE WHEN trim(text) = '' THEN 'unknown'
       |  WHEN ${tokenHas("data")} AND ${tokenHas("table")} THEN 'analytical'
       |  WHEN ${tokenHas("fast")} AND ${tokenHas("slow")} THEN 'comparative'
       |  WHEN ${tokenHas("stream")} THEN 'evolutionary'
       |  WHEN ${tokenHas("spark")} THEN 'announcement'
       |  ELSE ${pickSql(StructureLabels, hashBucketSql("text", 9))} END""".stripMargin

  private def toneSql: String = {
    val n = Tones.length
    def p(i: Int) = pickSql(Tones, hashBucketSql(s"concat(text, '#$i')", n))
    s"""concat(t1,
       |  CASE WHEN t2 != t1 THEN concat(', ', t2) ELSE '' END,
       |  CASE WHEN t3 != t1 AND t3 != t2 THEN concat(', ', t3) ELSE '' END) AS tone
       |FROM (SELECT doc_id, ${p(1)} AS t1, ${p(2)} AS t2, ${p(3)} AS t3 FROM documents)""".stripMargin
  }

  private val disallowedSql =
    """(contains(topic, '...') OR contains(topic, '?') OR contains(topic, '_')
      |  OR contains(topic, '{') OR contains(topic, '}') OR contains(topic, '[') OR contains(topic, ']')
      |  OR contains(topic, '<') OR contains(topic, '>')
      |  OR regexp_matches(topic, '[\x{4e00}-\x{9fff}]')
      |  OR lower(trim(topic)) = 'unknown')""".stripMargin

  val oracle: Map[String, String] = Map(
    "p03_structure" ->
      s"SELECT doc_id, $structureSql AS structure FROM documents ORDER BY doc_id",
    "p06_topic" ->
      s"SELECT doc_id, $topicSql AS topic FROM documents ORDER BY doc_id",
    "p07_clean_topics" ->
      s"""SELECT doc_id, topic FROM (SELECT doc_id, $topicSql AS topic FROM documents)
         |WHERE NOT $disallowedSql ORDER BY doc_id""".stripMargin,
    "p09_tone" ->
      s"SELECT doc_id, $toneSql ORDER BY doc_id",
    "p11_opinion" ->
      s"SELECT doc_id, $opinionSql AS opinion FROM documents ORDER BY doc_id",
    "p12_clean_opinions" ->
      s"""SELECT doc_id, opinion FROM (SELECT doc_id, $opinionSql AS opinion FROM documents)
         |WHERE NOT (regexp_matches(opinion, '[\\x{4e00}-\\x{9fff}]') OR lower(trim(opinion)) = 'unknown')
         |ORDER BY doc_id""".stripMargin,
    "p14_context" ->
      s"SELECT doc_id, $contextSql AS context FROM documents ORDER BY doc_id",
    "p15_clean_context" ->
      s"""SELECT doc_id, context FROM (SELECT doc_id, $contextSql AS context FROM documents)
         |WHERE NOT (regexp_matches(context, '[\\x{4e00}-\\x{9fff}]') OR lower(trim(context)) = 'unknown'
         |  OR contains(context, '650+'))
         |ORDER BY doc_id""".stripMargin)
}
