package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Output-side helpers: partitioned/bucketed batch parquet and streaming
  * file/foreachBatch sinks.
  *
  * Scale rules encoded here:
  *  - partition columns must be LOW cardinality (tier, date, split —
  *    never doc_id): each distinct value is a directory;
  *  - repartition on the partition columns before writing so each
  *    partition directory is written by the tasks owning it (without
  *    this, every task appends a file to every directory →
  *    tasks × partitions small files);
  *  - bucketing persists the shuffle: two tables bucketed by the same
  *    key join without exchanging either side;
  *  - streaming writes go through exactly-once file-sink commits, with
  *    Trigger.AvailableNow for catch-up/backfill runs.
  */
object Sinks {

  /** Batch parquet partitioned by `partitionCols`, one shuffle on the
    * partition key so files-per-directory ≈ its task count, not
    * tasks × directories. */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted table for co-located joins: `SortMergeJoin` over
    * two tables bucketed by the same key on the same count needs no
    * exchange at read time. (Table sink — bucketing metadata lives in the
    * catalog.) */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Streaming parquet file sink (exactly-once via the file-sink commit
    * log). Caller starts it: `.start()` for continuous,
    * `.trigger(AvailableNow)` already applied for drain-and-stop runs. */
  def streamingParquet[T](ds: Dataset[T], path: String, checkpoint: String): DataStreamWriter[T] =
    ds.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())

  /** Small-file compaction: rewrite a parquet dataset into files of
    * ~`targetBytes` each (sized from the source's actual on-disk footprint
    * via the Hadoop FileSystem, so it works on HDFS/S3 too). Streaming
    * sinks and fine-grained partitioned writes accumulate small files;
    * at scale, scan throughput is gated on file count (task scheduling +
    * footer reads), so periodic compaction is part of operating the
    * pipeline. Reads `srcPath` itself (so the data written is exactly the
    * data that was sized) and REFUSES in-place compaction: overwriting
    * the path being read is non-atomic on object stores and clobbers the
    * source on failure. */
  def compactParquet(
      spark: SparkSession,
      srcPath: String,
      dest: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val hSrc = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hSrc.getFileSystem(conf)
    val qSrc = fs.makeQualified(hSrc)
    val qDest = new org.apache.hadoop.fs.Path(dest).getFileSystem(conf)
      .makeQualified(new org.apache.hadoop.fs.Path(dest))
    // Ancestry, not just equality: dest nested under src writes part
    // files into the tree being read (the next scan sees both copies),
    // and src nested under dest means the Overwrite deletes its own
    // input's parent. Both are the corruption class this guard refuses.
    def isAncestor(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Boolean = {
      var p: org.apache.hadoop.fs.Path = b
      while (p != null) {
        if (p == a) return true
        p = p.getParent
      }
      false
    }
    require(!isAncestor(qSrc, qDest) && !isAncestor(qDest, qSrc),
      s"compactParquet refuses overlapping src/dest trees: $qSrc vs $qDest")
    val bytes = fs.getContentSummary(hSrc).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcPath)
      .repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(dest)
  }

  /** Streaming dedup-upsert into a batch parquet target via foreachBatch:
    * each micro-batch keeps the min-`orderCol` row per `keyCol` within
    * the batch and appends only keys not already present in the target —
    * the batch side of dd_exact for at-least-once streams whose
    * redeliveries outlive the watermark horizon (the in-horizon path is
    * EventStreams.dedupEvents). The anti-join reads only the target's
    * `keyCol` column (parquet column pruning). */
  def dedupUpsertParquet[T](
      ds: Dataset[T],
      path: String,
      checkpoint: String,
      keyCol: String,
      orderCol: String): DataStreamWriter[T] =
    ds.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        val spark = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol)).orderBy(col(orderCol))
        val inBatch = batch.toDF()
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        // Existence must go through Hadoop's FileSystem so the check works
        // on HDFS/S3/ABFS targets, not only file:// (java.io.File is always
        // false there, which would silently skip the anti-join and append
        // duplicate keys every micro-batch).
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
        val fresh =
          if (!fs.exists(hPath)) inBatch
          else inBatch.join(spark.read.parquet(path).select(keyCol),
            Seq(keyCol), "left_anti")
        fresh.write.mode(SaveMode.Append).parquet(path)
        ()
      }
}
