package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Orchestrated end-to-end pipeline run with standardized artifacts —
  * the Spark-native equivalent of the reference's Prefect flow
  * (orchestration/prefect_flow.py:50-97: 17 → 18 → 22 → 23 → reward
  * report, each stage a subprocess writing a jsonl/csv artifact under a
  * run id).
  *
  * Here every stage is already a pure Catalyst plan builder in
  * `SparkEntry.queries`, so orchestration reduces to: resolve each named
  * stage, write its result as parquet under `outDir/<runId>/<stage>`,
  * and record a manifest row (stage, rows, path, wall millis). No
  * subprocesses, no intermediate jsonl — lineage stays inside one Spark
  * session, and a failed stage fails the run loudly rather than leaving
  * a half-written artifact chain.
  *
  * Scale notes (100 TB): artifacts are written with each stage's native
  * output partitioning (no coalesce(1) — that is Verify's
  * small-file convenience, wrong at scale). Row counts come from the
  * written parquet footers (metadata-only aggregate pushdown), not a
  * second evaluation of the stage plan. The manifest itself is one tiny
  * JSON file per run.
  */
object Pipeline {

  /** The reference flow's stage chain (prefect_flow.py:87-96) plus the
    * reward-evaluation report it submits last (evaluate_rewards). */
  val defaultStages: Seq[String] =
    Seq("p17_style", "p18_prompts", "p22_dataset", "p23_split", "rw_report")

  final case class StageArtifact(
      run_id: String,
      stage: String,
      path: String,
      rows: Long,
      millis: Long)

  /** Run `stages` in order against `sfDir`, writing one parquet artifact
    * per stage under `outDir/<runId>/`, and return the manifest (also
    * persisted as `outDir/<runId>/_manifest`, single JSON file). */
  def run(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      runId: String,
      stages: Seq[String] = defaultStages): DataFrame = {
    import spark.implicits._
    val unknown = stages.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown pipeline stages: ${unknown.mkString(", ")}")

    val artifacts = stages.map { stage =>
      val path = s"$outDir/$runId/$stage"
      val t0 = System.nanoTime()
      SparkEntry.queries(stage)(spark, sfDir).write.mode("overwrite").parquet(path)
      // Footer-only count of what was actually written (not a re-run of
      // the stage plan).
      val rows = spark.read.parquet(path).count()
      StageArtifact(runId, stage, path, rows, (System.nanoTime() - t0) / 1000000L)
    }
    val manifest = artifacts.toDF()
    manifest.coalesce(1).write.mode("overwrite").json(s"$outDir/$runId/_manifest")
    manifest
  }

  /** CLI: Pipeline <sfDir> <outDir> [runId] [stage,stage,...] */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val runId = args.lift(2).getOrElse(System.currentTimeMillis().toString)
    val stages = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultStages)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val manifest = run(spark, sfDir, outDir, runId, stages).collect()
    manifest.foreach(r => println(s"[pipeline] $r"))
    spark.stop()
  }
}
