package graft

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Orchestrated end-to-end pipeline run with standardized artifacts —
  * the Spark-native equivalent of the reference's Prefect flow
  * (orchestration/prefect_flow.py:50-97: 17 → 18 → 22 → 23 → reward
  * report, each stage a subprocess writing a jsonl/csv artifact under a
  * run id) plus its manifest machinery (utils/manifest.py: per-stage
  * signatures, skip-if-unchanged; utils/contracts.py: a contract JSON
  * next to each artifact).
  *
  * Here every stage is already a pure Catalyst plan builder in
  * `SparkEntry.queries`, so orchestration reduces to: resolve each named
  * stage, write its result as parquet under `outDir/<runId>/<stage>`,
  * and record a manifest row (stage, rows, path, wall millis,
  * signature). No subprocesses, no intermediate jsonl — lineage stays
  * inside one Spark session, and a failed stage fails the run loudly
  * rather than leaving a half-written artifact chain.
  *
  * Scale notes (100 TB):
  *  - artifacts are written with each stage's native output partitioning
  *    (no coalesce(1) — that is Verify's small-file convenience, wrong at
  *    scale);
  *  - row counts come from the written parquet footers (metadata-only
  *    aggregate pushdown), not a second evaluation of the stage plan;
  *  - incremental signatures hash the input's FileSystem *metadata*
  *    (path, length, modification time — one namenode/object-store
  *    listing), never file contents: the reference streams every input
  *    byte through sha256 (utils/manifest.py compute_hash), which is a
  *    full extra read of the corpus at 100 TB;
  *  - all existence checks go through Hadoop's FileSystem so they hold
  *    on HDFS/S3/ABFS, not only file://.
  */
object Pipeline {

  /** The reference flow's stage chain (prefect_flow.py:87-96) plus the
    * reward-evaluation report it submits last (evaluate_rewards). */
  val defaultStages: Seq[String] =
    Seq("p17_style", "p18_prompts", "p22_dataset", "p23_split", "rw_report")

  /** The pretraining-corpus curation chain: rule gate, dedup decisions,
    * contamination, the composed per-doc verdict, mixture resample,
    * sequence packing. Each stage is an INDEPENDENT full-corpus query
    * (oracle-gated `SparkEntry.queries` entries) writing its own
    * artifact; the cur_verdict artifact is the drop-list — a consumer
    * filters tx_mix/tx_pack output on `train_keep = 1` (they are not
    * pre-filtered, and cur_verdict re-evaluates its inputs rather than
    * reading the sibling artifacts — acceptable at harness scale, while
    * a 100 TB run would persist each stage once and join artifacts). */
  val curationStages: Seq[String] =
    Seq("tx_gopher", "dd_decisions", "tx_contamination", "cur_verdict",
      "tx_mix", "tx_pack")

  /** The stage-21 cluster-analysis chain: Lloyd's cluster sizes, per-
    * vector assignment, per-cluster label profile, simplified-silhouette
    * separability, PCA projection. Same artifact contract as
    * [[curationStages]]: each stage is an independent gated query; the
    * three Lloyd's-derived stages re-train the (checkpointed) centroid
    * chain per stage at harness scale, where a 100 TB run persists the
    * centroid artifact once and joins it (the analysis passes are
    * map-only against a broadcast of that artifact). */
  val clusteringStages: Seq[String] =
    Seq("p21_lloyds", "p21_cluster_assign", "p21_cluster_profile",
      "p21_separability", "p21_pca")

  final case class StageArtifact(
      run_id: String,
      stage: String,
      path: String,
      rows: Long,
      millis: Long,
      signature: String,
      skipped: Boolean)

  /** Input signature for a stage: sha256 over every LEAF file's status
    * (qualified path, length, mtime) under `sfDir` + the stage name,
    * via one RECURSIVE metadata listing (`fs.listFiles(p, true)`) — no
    * data read. Recursion matters for nested table directories (the
    * production layout): a part-file rewritten in place inside a
    * subdirectory need not change the parent's entry — HDFS directory
    * mtime only moves on entry add/remove, and object-store pseudo-dirs
    * report zero — so a top-level listing would let incremental mode
    * silently skip a stage against stale inputs. */
  private[graft] def inputSignature(spark: SparkSession, sfDir: String, stage: String): String = {
    val p = new Path(sfDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val md = MessageDigest.getInstance("SHA-256")
    md.update(stage.getBytes("UTF-8"))
    val it = fs.listFiles(p, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      entries += s"|${st.getPath.toUri.getPath}:${st.getLen}:${st.getModificationTime}"
    }
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Run `stages` in order against `sfDir`, writing one parquet artifact
    * per stage under `outDir/<runId>/`, and return the manifest (also
    * persisted as `outDir/<runId>/_manifest`, single JSON file; each
    * artifact carries a `_contract.json` with schema + row count).
    *
    * With `incremental = true`, a stage whose signature matches the
    * previous run's manifest AND whose artifact still exists is skipped
    * (reference: utils/manifest.py should_skip). */
  def run(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      runId: String,
      stages: Seq[String] = defaultStages,
      incremental: Boolean = false): DataFrame = {
    import spark.implicits._
    val unknown = stages.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown pipeline stages: ${unknown.mkString(", ")}")

    val conf = spark.sessionState.newHadoopConf()
    def fsFor(p: Path) = p.getFileSystem(conf)
    val manifestPath = new Path(s"$outDir/$runId/_manifest")

    // Previous run's per-stage signatures (incremental mode only).
    val prevSignatures: Map[String, String] =
      if (incremental && fsFor(manifestPath).exists(manifestPath))
        spark.read.json(manifestPath.toString)
          .select("stage", "signature").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      else Map.empty

    val artifacts = stages.map { stage =>
      val path = s"$outDir/$runId/$stage"
      val hPath = new Path(path)
      val sig = inputSignature(spark, sfDir, stage)
      val skip = prevSignatures.get(stage).contains(sig) && fsFor(hPath).exists(hPath)
      val t0 = System.nanoTime()
      if (!skip) {
        SparkEntry.queries(stage)(spark, sfDir).write.mode("overwrite").parquet(path)
      }
      // Count what is actually on disk (not a re-run of the stage plan).
      // An empty-projection parquet count is row-group-metadata driven in
      // the vectorized reader (no column decode), but it IS a distributed
      // scan job — true footer-only aggregate pushdown needs the DSv2
      // reader, which parquet does not use by default.
      val written = spark.read.parquet(path)
      val rows = written.count()
      if (!skip) writeContract(spark, path, written.schema.fieldNames, rows, sig)
      StageArtifact(runId, stage, path, rows, (System.nanoTime() - t0) / 1000000L, sig, skip)
    }
    val manifest = artifacts.toDF()
    manifest.coalesce(1).write.mode("overwrite").json(manifestPath.toString)
    manifest
  }

  /** Contract JSON inside the artifact directory (underscore-prefixed —
    * ignored by parquet readers). Reference: utils/contracts.py
    * write_contract (schema_version, signature, counts). */
  private def writeContract(
      spark: SparkSession,
      artifactPath: String,
      columns: Array[String],
      rows: Long,
      signature: String): Unit = {
    val p = new Path(s"$artifactPath/_contract.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // Column names are data, not code: escape them (a name with a quote
    // or backslash must not corrupt the contract document).
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }
    val json =
      s"""{"schema_version": "1", "signature": "$signature", "rows": $rows,
         | "columns": [${columns.map(c => "\"" + esc(c) + "\"").mkString(", ")}]}""".stripMargin
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Contract check for a consumer: artifact has the required columns and
    * at least `minRows` rows per its contract (reference:
    * utils/validation.py validate_csv). */
  def validateArtifact(
      spark: SparkSession,
      artifactPath: String,
      requiredColumns: Seq[String],
      minRows: Long = 1L): Boolean = {
    import spark.implicits._
    val p = new Path(s"$artifactPath/_contract.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return false
    // Underscore-prefixed files are invisible to Spark's file index (by
    // design — that's why the contract doesn't pollute the parquet scan),
    // so read the bytes through the FileSystem and parse in-memory.
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      buf.toString("UTF-8")
    } finally in.close()
    val row = spark.read.json(Seq(text).toDS()).select("rows", "columns").head()
    val cols = row.getAs[scala.collection.Seq[String]]("columns").toSet
    row.getAs[Long]("rows") >= minRows && requiredColumns.forall(cols.contains)
  }

  /** CLI: Pipeline <sfDir> <outDir> [runId] [stage,stage,...] —
    * SPARK_GRAFT_INCREMENTAL=1 enables skip-if-unchanged. */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val runId = args.lift(2).getOrElse(System.currentTimeMillis().toString)
    val stages = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultStages)
    val incremental = sys.env.get("SPARK_GRAFT_INCREMENTAL").contains("1")
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
    val manifest = run(spark, sfDir, outDir, runId, stages, incremental).collect()
    manifest.foreach(r => println(s"[pipeline] $r"))
    spark.stop()
  }
}
