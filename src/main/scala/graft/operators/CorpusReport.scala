package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** dd_corpus_report: the corpus CURATION dashboard — one (metric, value)
  * table summarizing what the dedup + text-quality suite says about a
  * corpus: document count, exact-dup cluster count and extra copies,
  * near-dup pair counts per method, and the median novelty / quality
  * scores. This is the operational "how dirty is this crawl" surface a
  * training-data pipeline runs before spending GPU-hours on it
  * (reference counterpart: the aggregate report style of
  * scripts/evaluate_rewards.py / utils/reports.py, applied to curation).
  *
  * Each metric is a keyless aggregate over an existing oracle-gated
  * operator's plan — no new semantics, so the DuckDB mirror just wraps
  * the same per-operator SQL in scalar subqueries. The report evaluates
  * each sub-pipeline once (they share scans via their own structure, not
  * cross-metric CSE); at 100 TB run it as one job alongside the pipeline
  * rather than per-query.
  *
  * Medians route through [[graft.functions.Quantiles.pctl]] — exact for
  * the parity gate, approx_percentile at scale via the session knob. */
object CorpusReport {

  private def metric(name: String, v: Column, df: DataFrame): DataFrame =
    df.agg(v.cast("long").as("value")).select(lit(name).as("metric"), col("value"))

  def ddCorpusReport(spark: SparkSession, sfDir: String): DataFrame = {
    // Both exact-dup metrics come out of ONE aggregate over ONE instance
    // of the ddExact plan (stack unpivots the two values into rows) —
    // two separate metric() branches would each re-scan and re-shuffle
    // the fingerprint groupBy.
    val exactStats = Dedup.ddExact(spark, sfDir)
      .agg(count(lit(1)).cast("long").as("c"),
        // docs beyond the first of each fingerprint = rows dedup removes
        (sum(col("n_docs")) - count(lit(1))).cast("long").as("x"))
      .selectExpr("stack(2, 'exact_clusters', c, 'exact_extra_copies', x) AS (metric, value)")
    val rows = Seq(
      metric("n_docs", count(lit(1)), Tables.documents(spark, sfDir)),
      exactStats,
      // Pair counts by IDENTITY from the compact cached frames
      // (Σ C(n,2) within + Σ n_a·n_b across verified edges) — the
      // dashboard never streams the quadratic doc-pair expansion
      // (PairCountSpec pins the identity against the expanded form).
      Dedup.minhashPairCount(spark, sfDir)
        .select(lit("minhash_pairs").as("metric"), col("n_pairs").as("value")),
      Dedup.simhashPairCount(spark, sfDir)
        .select(lit("simhash_pairs").as("metric"), col("n_pairs").as("value")),
      metric("ngram_pairs", count(lit(1)), Dedup.ddNgramJaccard(spark, sfDir)),
      metric("novelty_p50_ppm",
        round(graft.functions.Quantiles.pctl(spark, "novelty_ppm", 0.5), 0),
        TextOps.txCorpusNovelty(spark, sfDir)),
      metric("quality_p50_ppm",
        round(graft.functions.Quantiles.pctl(spark, "quality_ppm", 0.5), 0),
        TextOps.txQuality(spark, sfDir)))
    rows.reduce(_ unionByName _).orderBy(col("metric"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("dd_corpus_report" -> (ddCorpusReport _))

  private def scalarOver(name: String, agg: String, innerSql: String): String =
    s"SELECT '$name' AS metric, CAST($agg AS BIGINT) AS value FROM ($innerSql)"

  val oracle: Map[String, String] = Map(
    "dd_corpus_report" -> Seq(
      "SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents",
      scalarOver("exact_clusters", "count(*)", Dedup.oracle("dd_exact")),
      scalarOver("exact_extra_copies", "sum(n_docs) - count(*)", Dedup.oracle("dd_exact")),
      scalarOver("minhash_pairs", "count(*)", Dedup.oracle("dd_minhash_lsh")),
      scalarOver("simhash_pairs", "count(*)", Dedup.oracle("dd_simhash")),
      scalarOver("ngram_pairs", "count(*)", Dedup.oracle("dd_ngram_jaccard")),
      scalarOver("novelty_p50_ppm", "round(quantile_cont(novelty_ppm, 0.5), 0)",
        TextOps.oracle("tx_corpus_novelty")),
      scalarOver("quality_p50_ppm", "round(quantile_cont(quality_ppm, 0.5), 0)",
        TextOps.oracle("tx_quality")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY metric"))
}
