package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The model-annotation extension seam.
  *
  * The reference's generative annotation stages (6-extract-topics.py,
  * 9-extract-tone.py, 11-extract-opinion.py, 14-extract-context.py) are
  * vLLM calls over row batches; this library re-expresses their
  * DETERMINISTIC surface as exact operators (Annotations.scala), but a
  * real deployment still needs the non-deterministic path: "run a model
  * over every document" as a first-class, scale-shaped operator. This is
  * that seam — the Scala analogue of PySpark's `mapInPandas` /
  * `applyInPandas` contract:
  *
  *  - the CALLER owns partitioning (repartition upstream to match model
  *    servers; partitions process independently on executors),
  *  - the seam owns batching: the plugged function always sees a bounded
  *    [[DocBatch]] (≤ batchSize rows, never empty), the unit a model
  *    server wants, regardless of partition sizes,
  *  - the output is the (doc_id, annotation) ARTIFACT table, joined back
  *    on doc_id downstream (the run-once-persist-join shape
  *    Pipeline.curationStages uses) — re-annotation reruns one stage,
  *    not the pipeline.
  *
  * At 100 TB: annotation cost is the model call, so the plan is one
  * map-only pass with no shuffle introduced by the seam itself; batches
  * bound peak memory per task; a failed task retries only its partition.
  * The deterministic stub in AnnotateSpec pins the contract (batch
  * bounds, 1:1 output, id alignment) without a model in the container.
  */
object Annotate {

  /** One bounded unit of model work: parallel id/text arrays
    * (column-batch shape, like an Arrow record batch). */
  final case class DocBatch(docIds: Array[Long], texts: Array[String]) {
    def size: Int = docIds.length
  }

  val DefaultBatchSize = 64

  /** Run `fn` over every document in bounded batches; returns the
    * (doc_id, annotation) artifact table. `fn` must return exactly one
    * annotation per input row, in order — enforced loudly per batch. */
  def annotateBatches(
      docs: DataFrame,
      batchSize: Int = DefaultBatchSize)(
      fn: DocBatch => Seq[String]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val batch = DocBatch(chunk.map(_._1).toArray, chunk.map(_._2).toArray)
          val out = fn(batch)
          require(out.size == batch.size,
            s"annotator returned ${out.size} rows for a ${batch.size}-row batch")
          batch.docIds.iterator.zip(out.iterator)
        }
      }
      .toDF("doc_id", "annotation")
  }

  /** Grouped variant (the applyInPandas shape): all rows of one key reach
    * `fn` together — for annotations that need whole-group context (the
    * reference's per-author stages). Shuffles once on the key; per-group
    * state must fit an executor, so key on something bounded (author,
    * source), never the corpus. Same loud 1:1 contract as
    * [[annotateBatches]]: the returned ids must be exactly the group's
    * ids — a dropped, duplicated, or foreign doc_id would otherwise
    * silently corrupt the artifact table at the downstream join. */
  def annotateGroups(
      docs: DataFrame,
      keyCol: String)(
      fn: (String, Seq[(Long, String)]) => Seq[(Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(keyCol).cast("string"), col("doc_id").cast("long"), col("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val group = rows.map(r => (r._2, r._3)).toSeq
        val out = fn(key, group)
        val want = group.map(_._1).sorted
        val got = out.map(_._1).sorted
        require(got == want,
          s"annotator for group '$key' returned ids ${got.take(5)}… " +
            s"!= group ids ${want.take(5)}… (${out.size} rows for ${group.size})")
        out.iterator
      }
      .toDF("doc_id", "annotation")
  }
}
