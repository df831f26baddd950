package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Ingestion contract validation — the reference's stage-I/O validation
  * (utils/validation.py:1-100: required keys, allowed values, per-record
  * type/consistency checks over CSV/JSONL stage artifacts) as a
  * first-class per-row operator a production ingest runs before anything
  * else touches the corpus.
  *
  * Two surfaces:
  *  - [[validateDocs]]: the documents-table contract (required fields,
  *    lang enum, n_chars↔text consistency) → per-row violation bitmask +
  *    keep flag, composable into cur_verdict like the Gopher gate.
  *  - [[validatePosts]]: the same shape over the JSONL post frame
  *    ([[graft.sources.PostsJsonl.read]]) including the corrupt-line
  *    surface — required post_text, non-negative engagement counts,
  *    follower range — exercised by the corrupt-fixture spec.
  *
  * The gated query `src_validate` follows the p24 house pattern (inject →
  * detect, both deterministic): a hash-derived corruption injector
  * plants contract violations in a twin of the documents table —
  * nulled/emptied text, an out-of-enum lang, a nulled source, a skewed
  * n_chars — and the validator's bitmask must recover exactly which rows
  * were damaged and why. Clean testdata alone would make the gate a
  * constant-zero column; the injector gives every violation class live
  * rows at every SF on both engines.
  *
  * Scale shape: map-only, shuffle-free, whole-stage codegen (null/enum/
  * length checks only) — a pure linear scan at 100 TB; the only shuffle
  * is the presentation ORDER BY.
  */
object Validation {

  /** Allowed language codes (the testdata generator's enum; a production
    * contract supplies its own). */
  private[operators] val AllowedLangs = Seq("en", "es", "de", "fr", "zh")

  // Violation bits (validation.py's three check families).
  val BitRequired = 1L // required key missing/empty (text, source)
  val BitEnum = 2L     // value outside the allowed set (lang)
  val BitRange = 4L    // range/consistency failure (n_chars vs text)

  // Corruption injector moduli — coprime so single- and multi-violation
  // rows both occur (doc_id 0 trips several at once).
  private val MutNullText = 13L
  private val MutBadLang = 17L
  private val MutBadChars = 19L
  private val MutNullSource = 23L
  private val MutEmptyText = 29L

  private def inSet(x: String, xs: Seq[String]): String =
    xs.map(s => "'" + s + "'").mkString(s"$x IN (", ", ", ")")

  /** The deterministically-damaged twin of the documents table — the
    * operator's embedded corrupt fixture (the p24-negatives pattern:
    * the injector and the detector ship together, so the gate proves
    * detection, not just schema). */
  private[operators] def corruptedDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % MutNullText === 0, lit(null).cast("string"))
        .when(col("doc_id") % MutEmptyText === 0, lit(""))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % MutBadLang === 0, lit("xx"))
        .otherwise(col("lang")).as("lang"),
      when(col("doc_id") % MutNullSource === 0, lit(null).cast("string"))
        .otherwise(col("source")).as("source"),
      when(col("doc_id") % MutBadChars === 0, col("n_chars") + 7L)
        .otherwise(col("n_chars")).as("n_chars"))

  /** Per-row contract verdict over a documents-shaped frame: violations
    * bitmask, violation count, keep flag, first failed check name. */
  private[operators] def validateDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("__v_req",
        when(col("text").isNull || length(col("text")) === 0 ||
          col("source").isNull, BitRequired).otherwise(0L))
      .withColumn("__v_enum",
        when(col("lang").isNull ||
          !expr(inSet("lang", AllowedLangs)), BitEnum).otherwise(0L))
      .withColumn("__v_range",
        when(col("n_chars").isNull || col("n_chars") < 0 ||
          (col("text").isNotNull && col("n_chars") =!= length(col("text"))),
          BitRange).otherwise(0L))
      .withColumn("violations",
        col("__v_req") + col("__v_enum") + col("__v_range"))
      .withColumn("n_viol",
        when(col("__v_req") =!= 0L, 1L).otherwise(0L) +
          when(col("__v_enum") =!= 0L, 1L).otherwise(0L) +
          when(col("__v_range") =!= 0L, 1L).otherwise(0L))
      .withColumn("keep", when(col("violations") === 0L, 1L).otherwise(0L))
      .withColumn("first_reason",
        when(col("__v_req") =!= 0L, "missing_required")
          .when(col("__v_enum") =!= 0L, "bad_enum")
          .when(col("__v_range") =!= 0L, "bad_range")
          .otherwise(""))
      .drop("__v_req", "__v_enum", "__v_range")

  /** src_validate: the contract verdict over the damaged twin — the
    * hash-gated inject→detect round trip. */
  def srcValidate(spark: SparkSession, sfDir: String): DataFrame =
    validateDocs(corruptedDocs(Tables.documents(spark, sfDir)))
      .select(col("doc_id"), col("violations").cast("long"),
        col("n_viol").cast("long"), col("keep"), col("first_reason"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** The JSONL post-frame contract ([[graft.sources.PostsJsonl.read]]
    * output): corrupt line (bit 1), missing post_text (bit 2), negative
    * engagement counts (bit 4), follower_count outside [0, 10^9]
    * (bit 8). Spec-exercised via the corrupt-line fixture; a production
    * ingest filters on keep=1 and routes keep=0 to a quarantine sink. */
  def validatePosts(posts: DataFrame): DataFrame = {
    val neg = Seq("total_likes_count", "comments_count", "shares_count")
      .map(c => col(c).isNotNull && col(c) < 0L)
      .reduce(_ || _)
    posts
      .withColumn("__v_corrupt", when(col("is_corrupt"), 1L).otherwise(0L))
      .withColumn("__v_text",
        when(!col("is_corrupt") && col("post_text").isNull, 2L).otherwise(0L))
      .withColumn("__v_neg", when(neg, 4L).otherwise(0L))
      .withColumn("__v_followers",
        when(col("follower_count").isNotNull &&
          (col("follower_count") < 0L ||
            col("follower_count") > 1000000000L), 8L).otherwise(0L))
      .withColumn("violations",
        col("__v_corrupt") + col("__v_text") + col("__v_neg") +
          col("__v_followers"))
      .withColumn("keep", when(col("violations") === 0L, 1L).otherwise(0L))
      .drop("__v_corrupt", "__v_text", "__v_neg", "__v_followers")
  }

  // ---- DuckDB mirror (generated from the SAME moduli/enum/bits) ----

  private val validateSql: String =
    s"""WITH m AS (SELECT doc_id,
       |    CASE WHEN doc_id % $MutNullText = 0 THEN NULL
       |      WHEN doc_id % $MutEmptyText = 0 THEN '' ELSE text END AS text,
       |    CASE WHEN doc_id % $MutBadLang = 0 THEN 'xx' ELSE lang END AS lang,
       |    CASE WHEN doc_id % $MutNullSource = 0 THEN NULL ELSE source END AS source,
       |    CASE WHEN doc_id % $MutBadChars = 0 THEN n_chars + 7 ELSE n_chars END AS n_chars
       |  FROM documents),
       |v AS (SELECT doc_id,
       |    CASE WHEN text IS NULL OR length(text) = 0 OR source IS NULL
       |      THEN $BitRequired ELSE 0 END AS v_req,
       |    CASE WHEN lang IS NULL OR NOT (${inSet("lang", AllowedLangs)})
       |      THEN $BitEnum ELSE 0 END AS v_enum,
       |    CASE WHEN n_chars IS NULL OR n_chars < 0
       |        OR (text IS NOT NULL AND n_chars != length(text))
       |      THEN $BitRange ELSE 0 END AS v_range
       |  FROM m)
       |SELECT doc_id,
       |  CAST(v_req + v_enum + v_range AS BIGINT) AS violations,
       |  CAST((CASE WHEN v_req != 0 THEN 1 ELSE 0 END)
       |    + (CASE WHEN v_enum != 0 THEN 1 ELSE 0 END)
       |    + (CASE WHEN v_range != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_viol,
       |  CAST(CASE WHEN v_req + v_enum + v_range = 0 THEN 1 ELSE 0 END AS BIGINT)
       |    AS keep,
       |  CASE WHEN v_req != 0 THEN 'missing_required'
       |    WHEN v_enum != 0 THEN 'bad_enum'
       |    WHEN v_range != 0 THEN 'bad_range' ELSE '' END AS first_reason
       |FROM v ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_validate" -> (srcValidate _))

  val oracle: Map[String, String] = Map(
    "src_validate" -> validateSql)
}
