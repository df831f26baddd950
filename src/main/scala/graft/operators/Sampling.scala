package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.nibble

/** Scalable deterministic per-group ranking.
  *
  * Several pipeline stages (p05 balance, p23 split) need "the first N rows
  * of each group under a deterministic hash order". A plain
  * `row_number() OVER (PARTITION BY group ORDER BY hash)` funnels every
  * group into a single sort task — with ~160 combo groups that is a hard
  * parallelism ceiling at 100 TB (the same failure mode the round-1 as-of
  * join had).
  *
  * [[hashRank]] computes the exact same rank in two passes with bounded
  * task sizes:
  *   1. bucket each row by the first two hex chars of its hash (256
  *      buckets; bucket order == hash order because the bucket is a prefix),
  *      aggregate per-(group, bucket) counts — a tiny table (|groups|*256)
  *      that is windowed into per-bucket starting offsets and broadcast;
  *   2. rank rows only within (group, bucket) — 256x more partitions, each
  *      sort task sees ~1/256 of a group — and add the bucket offset.
  *
  * The result is identical to the single-window formulation, which is what
  * the DuckDB oracle uses.
  */
object Sampling {

  /** Adds `rankCol` = 1-based rank of the row within its `groupCols` group
    * under `(hashCol asc, tieCol asc)` ordering. `hashCol` must be a
    * lowercase hex string (md5). */
  def hashRank(df: DataFrame, groupCols: Seq[String], hashCol: Column,
               tieCol: Column, rankCol: String): DataFrame = {
    val withH = df
      .withColumn("__h", hashCol)
      .withColumn("__b", nibble(substring(col("__h"), 1, 1)) * 16 +
        nibble(substring(col("__h"), 2, 1)))
    // Pass 1: per-(group, bucket) counts -> running offset before each
    // bucket. |groups|*256 rows: the window here sorts a tiny table.
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__b"))
    val offsets = withH.groupBy((groupCols :+ "__b").map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(offW) - col("__cnt"), lit(0L)))
      .drop("__cnt")
    // Pass 2: rank within (group, bucket) only; add the bucket offset.
    val inBucketW = Window
      .partitionBy((groupCols :+ "__b").map(col): _*)
      .orderBy(col("__h"), tieCol)
    withH
      .join(broadcast(offsets), groupCols :+ "__b")
      .withColumn(rankCol, row_number().over(inBucketW) + col("__off"))
      .drop("__h", "__b", "__off")
  }
}
