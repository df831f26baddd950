package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Readers for the driver-generated star schema (TESTDATA.md).
  *
  * Every operator takes its inputs through here so the scan is always a
  * plain parquet relation Catalyst can push filters/projections into.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** events.ts has shipped in three parquet encodings across testdata
    * generations; normalize all of them to TimestampType so every
    * consumer sees one dtype:
    *   - TIMESTAMP(NANOS): vectorized reader rejects it → read as long
    *     nanos (legacy conf) and truncate to micros, matching DuckDB's
    *     TIMESTAMP_NS → TIMESTAMP cast.
    *   - timestamp[us] with isAdjustedToUTC=false → TIMESTAMP_NTZ →
    *     cast to TimestampType (exact under the UTC session TZ, the
    *     same instant DuckDB computes reading it natively).
    *   - timestamp[us] UTC-adjusted → already TimestampType, passthrough.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Session builders (Verify/Bench/tests) set these at build time; the
    // guard only covers ad-hoc sessions and avoids re-mutating shared conf.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ → TimestampType cast below is instant-exact ONLY under a
    // UTC session zone; a non-UTC ad-hoc session would silently shift
    // every ts relative to the DuckDB oracle.
    if (s.conf.get("spark.sql.session.timeZone") != "UTC")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
