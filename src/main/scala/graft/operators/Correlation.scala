package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** p20: numeric feature ↔ engagement Pearson correlations (reference:
  * 20-permutation-and-correlation.py:384-400 calculate_feature_correlations;
  * feature set from :159-241 extract_features — the deterministic numeric
  * subset; the RF-importance half is model training, out of query scope
  * per SURVEY §1.8).
  *
  * Scale shape (100 TB): one full-scan aggregation. Pearson's co-moments
  * are computed by Spark's native `corr` (map-side partial aggregation,
  * one reduce of 8 tiny states — no shuffle of row data). Output is 8
  * rows. Correlations are rounded to ppm so engine-order float drift
  * cannot flip the hash.
  */
object Correlation {

  def p20Correlation(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    val toks = tokens(t)
    val sumTokLen = aggregate(transform(toks, x => length(x)), lit(0), (a, v) => a + v)
    val f = Tables.documents(spark, sfDir).select(
      length(t).cast("double").as("text_length"),
      tokenCount(t).cast("double").as("word_count"),
      // divisor clamped: subexpression elimination can hoist the division
      // out of the CASE branch, so a bare size() trips ANSI div-by-zero
      when(size(toks) === 0, 0.0)
        .otherwise(sumTokLen.cast("double") / greatest(size(toks), lit(1)))
        .as("avg_word_len"),
      lineBreakCount(t).cast("double").as("line_breaks"),
      emojiCount(t).cast("double").as("emoji_count"),
      hashtagCount(t).cast("double").as("hashtag_count"),
      distinctTokenCount(t).cast("double").as("vocab_distinct"),
      sentenceCount(t).cast("double").as("n_sentences"),
      DocPipeline.engagementPpm.cast("double").as("y"))
    val feats = Seq("text_length", "word_count", "avg_word_len", "line_breaks",
      "emoji_count", "hashtag_count", "vocab_distinct", "n_sentences")
    // not functions.corr: its Pearson evaluation divides by the raw
    // variance product, which under ANSI mode throws DIVIDE_BY_ZERO for a
    // zero-variance feature; try_divide yields NULL — exactly what DuckDB's
    // corr() returns (and the identical value otherwise: the n/(n-1)
    // factors cancel between covar_samp and stddev_samp).
    def corrOf(n: String) =
      expr(s"try_divide(covar_samp($n, y), stddev_samp($n) * stddev_samp(y))")
        .as(s"c_$n")
    val aggd = f.agg(corrOf(feats.head), feats.tail.map(corrOf): _*)
    val stackArgs = feats.map(n => s"'$n', c_$n").mkString(", ")
    aggd
      .selectExpr(s"stack(${feats.length}, $stackArgs) AS (feature, c)")
      .select(col("feature"),
        round(col("c") * 1000000, 0).cast("long").as("corr_ppm"))
      .orderBy(col("feature"))
  }

  /** The categorical half of the reference's correlation stage
    * (20-permutation-and-correlation.py:243-312 one-hot encoding →
    * per-category point-biserial Pearson vs engagement). Categories come
    * from the FIXED label taxonomies (not data-driven fit like sklearn's
    * OneHotEncoder — same resulting columns on this pipeline's own
    * labels, but deterministic and scan-free). Zero-variance categories
    * (absent from the corpus) yield NULL on both engines. Same one-pass
    * aggregation shape as p20_correlation: ~20 tiny corr states, no row
    * shuffle. */
  /** Category lists shared with the oracle SQL. */
  private val structCats = Annotations.StructureLabels :+ "unknown"
  private val usageCats = Seq("none", "very low", "low", "medium", "high", "extreme")
  private val paceCats = Seq("fast", "medium", "slow")

  def p20Onehot(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    val base = Tables.documents(spark, sfDir)
      .select(
        Annotations.structureCol.as("structure"),
        emojiUsage(t).as("emoji_usage"),
        tokenCount(t).cast("long").as("__nt"),
        sentenceCount(t).cast("long").as("__ns"),
        DocPipeline.engagementPpm.cast("double").as("y"))
      .withColumn("pacing", expr(
        """CASE WHEN __nt div greatest(__ns, 1L) < 8 THEN 'fast'
          |     WHEN __nt div greatest(__ns, 1L) < 15 THEN 'medium'
          |     ELSE 'slow' END""".stripMargin))
    val cats: Seq[(String, String)] = // (output name, source column === value)
      structCats.map(c => (s"structure=$c", "structure")) ++
        usageCats.map(c => (s"emoji_usage=$c", "emoji_usage")) ++
        paceCats.map(c => (s"pacing=$c", "pacing"))
    val withInd = cats.zipWithIndex.foldLeft(base) { case (df, ((name, src), i)) =>
      val value = name.substring(name.indexOf('=') + 1)
      df.withColumn(s"__i_$i", when(col(src) === value, 1.0).otherwise(0.0))
    }
    val aggCols = cats.zipWithIndex.map { case (_, i) =>
      expr(s"try_divide(covar_samp(__i_$i, y), stddev_samp(__i_$i) * stddev_samp(y))")
        .as(s"c_$i")
    }
    val aggd = withInd.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = cats.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', c_$i" }
      .mkString(", ")
    aggd
      .selectExpr(s"stack(${cats.length}, $stackArgs) AS (feature, c)")
      .select(col("feature"),
        round(col("c") * 1000000, 0).cast("long").as("corr_ppm"))
      .orderBy(col("feature"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p20_correlation" -> (p20Correlation _),
    "p20_onehot"      -> (p20Onehot _))

  private val toksSql =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"

  val oracle: Map[String, String] = Map(
    "p20_correlation" -> {
      val feats = Seq("text_length", "word_count", "avg_word_len", "line_breaks",
        "emoji_count", "hashtag_count", "vocab_distinct", "n_sentences")
      val unions = feats.map(n =>
        s"SELECT '$n' AS feature, CAST(round(c_$n * 1000000, 0) AS BIGINT) AS corr_ppm FROM c")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH f AS (
         |  SELECT
         |    CAST(length(text) AS DOUBLE) AS text_length,
         |    CAST(len($toksSql) AS DOUBLE) AS word_count,
         |    CASE WHEN len($toksSql) = 0 THEN 0.0
         |      ELSE CAST(list_sum(list_transform($toksSql, x -> length(x))) AS DOUBLE) / len($toksSql)
         |      END AS avg_word_len,
         |    CAST(length(text) - length(replace(text, chr(10), '')) AS DOUBLE) AS line_breaks,
         |    CAST(length(regexp_extract_all(text, '$EmojiClass')) AS DOUBLE) AS emoji_count,
         |    CAST(length(regexp_extract_all(text, '#\\w+')) AS DOUBLE) AS hashtag_count,
         |    CAST(length(list_distinct($toksSql)) AS DOUBLE) AS vocab_distinct,
         |    CAST(length(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '')) AS DOUBLE) AS n_sentences,
         |    CAST(${DocPipeline.engagementPpmSql} AS DOUBLE) AS y
         |  FROM documents),
         |c AS (
         |  SELECT ${feats.map(n => s"corr($n, y) AS c_$n").mkString(", ")} FROM f)
         |SELECT feature, corr_ppm FROM (
         |  $unions)
         |ORDER BY feature""".stripMargin
    },
    "p20_onehot" -> {
      val sentSql =
        "length(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != ''))"
      val cats: Seq[(String, String)] =
        (Annotations.StructureLabels :+ "unknown").map(c => (s"structure=$c", s"structure = '$c'")) ++
          Seq("none", "very low", "low", "medium", "high", "extreme")
            .map(c => (s"emoji_usage=$c", s"emoji_usage = '$c'")) ++
          Seq("fast", "medium", "slow").map(c => (s"pacing=$c", s"pacing = '$c'"))
      val indCols = cats.zipWithIndex.map { case ((_, cond), i) =>
        s"CASE WHEN $cond THEN 1.0 ELSE 0.0 END AS i_$i"
      }.mkString(",\n    ")
      val corrCols = cats.indices.map(i => s"corr(i_$i, y) AS c_$i").mkString(", ")
      val unions = cats.zipWithIndex.map { case ((name, _), i) =>
        s"SELECT '$name' AS feature, CAST(round(c_$i * 1000000, 0) AS BIGINT) AS corr_ppm FROM c"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH f0 AS (
         |  SELECT
         |    ${Annotations.structureSql} AS structure,
         |    ${DocPipeline.emojiUsageSql} AS emoji_usage,
         |    CASE WHEN len($toksSql) // GREATEST($sentSql, 1) < 8 THEN 'fast'
         |         WHEN len($toksSql) // GREATEST($sentSql, 1) < 15 THEN 'medium'
         |         ELSE 'slow' END AS pacing,
         |    CAST(${DocPipeline.engagementPpmSql} AS DOUBLE) AS y
         |  FROM documents),
         |f AS (
         |  SELECT y,
         |    $indCols
         |  FROM f0),
         |c AS (SELECT $corrCols FROM f)
         |SELECT feature, corr_ppm FROM (
         |  $unions)
         |ORDER BY feature""".stripMargin
    })
}
