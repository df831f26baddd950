package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL post ingestion — the reference's raw input format
  * (1-find-gradient.py:42-55): each line is either one post object or a
  * `{"posts": [...]}` wrapper; posts carry `post_text`, `follower_count`,
  * `total_likes_count`, `comments_count`, `shares_count`.
  *
  * The reader declares the full schema up front (no sampling-based
  * inference pass — at 100 TB, schema inference is a full extra scan) and
  * normalizes both shapes into one flat post table in a single projection.
  * Lines that parse but match neither shape yield null fields, mirroring
  * the reference's skip behavior (filter on `post_text IS NOT NULL`
  * downstream); `_corrupt_record` is retained so ingestion loss is
  * measurable instead of silent.
  */
object PostsJsonl {

  /** One post's fields (shared by the flat and wrapped shapes). */
  val postFields: Seq[StructField] = Seq(
    StructField("post_text", StringType),
    StructField("follower_count", LongType),
    StructField("total_likes_count", LongType),
    StructField("comments_count", LongType),
    StructField("shares_count", LongType))

  /** Line schema: flat post fields + optional `posts` wrapper array +
    * corrupt-line capture. */
  val lineSchema: StructType = StructType(
    postFields :+
      StructField("posts", ArrayType(StructType(postFields))) :+
      StructField("_corrupt_record", StringType))

  private val fieldNames = postFields.map(_.name)

  /** Read raw JSONL into the normalized flat post table
    * (post_text, follower_count, total_likes_count, comments_count,
    * shares_count, is_corrupt). Wrapped records explode one row per
    * element; flat records pass through. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(lineSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    // Wrapped shape → explode; flat shape → single-element array of self.
    val self = struct(fieldNames.map(col): _*)
    raw
      .withColumn("p",
        explode(when(col("posts").isNotNull, col("posts"))
          .otherwise(array(self))))
      .select(
        fieldNames.map(n => col(s"p.$n").as(n)) :+
          col("_corrupt_record").isNotNull.as("is_corrupt"): _*)
  }

  /** The engagement projection stage p01 consumes: non-corrupt rows with
    * text, metrics null-coalesced to 0 the way the reference's
    * `post.get(..., 0) or 0` does. */
  def posts(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(!col("is_corrupt") && col("post_text").isNotNull)
      .select(col("post_text"),
        coalesce(col("follower_count"), lit(0L)).as("follower_count"),
        coalesce(col("total_likes_count"), lit(0L)).as("total_likes_count"),
        coalesce(col("comments_count"), lit(0L)).as("comments_count"),
        coalesce(col("shares_count"), lit(0L)).as("shares_count"))
}
