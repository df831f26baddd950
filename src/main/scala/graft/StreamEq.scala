package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming._

/** Streaming-equivalence main: runs every SURVEY §2 EventStreams entry
  * (and both streaming sinks) against its batch twin on the REAL tables
  * and writes one machine-readable JSON record per entry — the
  * file-verifiable counterpart of StreamingSpec's in-CI equivalence
  * tests (CORRECTNESS_r*.json covers the batch operators; this covers
  * the streaming axis the DuckDB oracle can't).
  *
  * Each entry streams the real input through a MemoryStream (micro-batch
  * slicing + watermark sentinels where the entry is stateful), collects
  * the emitted rows, and compares them as a SET against the batch
  * operator's result — `equal` is exact row-set equality, not a count.
  * Failures are survivable and recorded per-entry (the Bench policy: one
  * broken entry must not erase the round's record).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.StreamEq [outPath]
  */
object StreamEq {

  /** Minimum stream-vs-batch recall (ppm) the nearDupPairs stress
    * exemption tolerates: a capped-unequal result passes the gate only
    * as a subset AND at/above this floor, so a BucketCap/state
    * regression that collapses recall fails loudly instead of being
    * quietly recorded (r12 ADVICE). The default cap is sized from the
    * recorded cap-vs-recall curve to clear this with margin. */
  val NdpRecallFloorPpm: Long =
    sys.env.get("SPARK_GRAFT_NDP_RECALL_FLOOR").flatMap { s =>
      // Guarded parse: this val initializes at object load, so an
      // unguarded .toLong on a malformed env var would abort the whole
      // harness before any check ran (r13 advice). Degrade to the
      // default loudly instead.
      val v = scala.util.Try(s.trim.toLong).toOption
      if (v.isEmpty) System.err.println(
        s"[streameq] ignoring malformed SPARK_GRAFT_NDP_RECALL_FLOOR '$s'")
      v
    }.getOrElse(950000L)

  private def t(s: String) = Timestamp.valueOf(s)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("STREAMEQ_r11.json")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    /** Peak state-store rows across a query's progress history — the
      * bounded-state evidence the stress section records (`-1` = the
      * entry has no state operator / state not sampled). */
    def peakStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.iterator
        .flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(-1L)(math.max)

    /** Runs the equivalence entries over `sfDir` (all of them when
      * `only` is empty) and returns per-entry
      * (stream_rows, batch_rows, equal, max_state_rows, err). */
    def runAll(sfDir: String, only: Set[String]): scala.collection.mutable.LinkedHashMap[
        String, (Long, Long, Boolean, Long, Option[String])] = {

    val results = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Boolean, Long, Option[String])]()
    var lastState = -1L
    var lastNote: Option[String] = None

    def check(name: String)(body: => (Long, Long, Boolean)): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      lastState = -1L
      lastNote = None
      val r =
        try { val (s, b, eq) = body; (s, b, eq, lastState, lastNote) }
        catch { case e: Throwable =>
          (-1L, -1L, false, -1L,
            Some("ERR " + Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next().take(200)))
        }
      results(name) = r
      System.err.println(s"[streameq] $name stream=${r._1} batch=${r._2} equal=${r._3}" +
        (if (r._4 >= 0) s" state=${r._4}" else "") +
        r._5.map(m => s" $m").getOrElse(""))
    }

    /** Drain `rows` through a stream builder in `nBatches` micro-batches
      * (plus optional watermark sentinels), return the memory table. */
    def drain[T: org.apache.spark.sql.Encoder](rows: Seq[T], table: String,
        mode: OutputMode, nBatches: Int = 2, sentinels: Seq[T] = Nil)(
        build: MemoryStream[T] => DataFrame): DataFrame = {
      val in = MemoryStream[T]
      val q = build(in).writeStream.format("memory").queryName(table)
        .outputMode(mode).start()
      try {
        val size = math.max(1, rows.length / nBatches)
        rows.grouped(size).foreach { g => in.addData(g); q.processAllAvailable() }
        sentinels.foreach { s => in.addData(s); q.processAllAvailable() }
        lastState = peakStateRows(q)
      } finally q.stop()
      spark.table(table)
    }

    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val docsDf = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val docEvents = docsDf
      .select(col("doc_id"), lit(t("2026-01-01 10:00:00")).as("ts"), col("text"))
      .as[DocEvent].collect().toIndexedSeq
    val maxEventTs = events.agg(max(col("ts"))).head().getTimestamp(0)

    // 1. windowedCounts vs the batch tumbling-window aggregate (Complete
    // mode: every window's final value). EXACT equality, not
    // modulo-cents: both sides sum per-row integer cents (the r15
    // family rule), so the stream's arrival-order fold and the batch
    // shuffle fold must produce the SAME long — whatever the
    // micro-batch slicing was.
    check("windowedCounts") {
      val batch = events
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("v"))
        .as[(Timestamp, String, Long, Long)].collect().toSet
      val rows = events.select(col("ts"), col("event_type"), col("value"))
        .as[(Timestamp, String, Double)].collect().toIndexedSeq
      val got = drain(rows, "eq_wc", OutputMode.Complete())(in =>
          EventStreams.windowedCounts(in.toDF().toDF("ts", "event_type", "value")))
        .select(col("hour"), col("event_type"), col("n"), col("v"))
        .as[(Timestamp, String, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 2. approxUsersWindowed vs the batch KMV sketch (merge-order
    // independent, so EQUAL estimates whatever the micro-batch slicing).
    check("approxUsersWindowed") {
      val batch = events
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
        .agg(graft.functions.Aggregates.kmvDistinct(
          graft.functions.Aggregates.kmvHash(col("user_id")),
          graft.operators.Analytics.KmvK).as("approx_users"))
        .as[(Timestamp, String, Long)].collect().toSet
      val rows = events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[ScoredEvent].collect().toIndexedSeq
      val got = drain(rows, "eq_kmv", OutputMode.Complete())(in =>
          EventStreams.approxUsersWindowed(in.toDF()))
        .as[(Timestamp, String, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 3. dedupEvents: every event redelivered in-batch; the surviving id
    // set must be exactly the distinct event ids.
    check("dedupEvents") {
      val batch = events.select(col("event_id")).distinct()
        .as[Long].collect().toSet
      val rows = events.select(col("event_id"), col("ts"), col("value"))
        .as[(Long, Timestamp, Double)].collect().toIndexedSeq
      val doubled = rows.flatMap(r => Seq(r, r))
      val got = drain(doubled, "eq_de", OutputMode.Append(), nBatches = 1)(in =>
          EventStreams.dedupEvents(in.toDF().toDF("event_id", "ts", "value")))
        .select(col("event_id")).as[Long].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 4. dedupDocs: each doc plus an uppercase redelivery (same normalized
    // fingerprint); one survivor per distinct fingerprint.
    check("dedupDocs") {
      val batch = docsDf
        .select(graft.functions.NativeExpressions.fingerprint(col("text")))
        .distinct().count()
      val doubled = docEvents.flatMap(d =>
        Seq(d, d.copy(text = d.text.toUpperCase(java.util.Locale.ROOT))))
      val got = drain(doubled, "eq_dd", OutputMode.Append(), nBatches = 1)(in =>
          EventStreams.dedupDocs(in.toDF()))
        .count()
      (got, batch, got == batch)
    }

    // 5. attributionJoin vs the identical batch interval join.
    check("attributionJoin") {
      val v = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val p = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val batch = v.alias("v").join(p.alias("p"),
          expr("""v.user_id = p.user_id AND
                  p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTES"""))
        .select(col("v.user_id"), col("v.ts"), col("p.ts"),
          round(col("p.value") * 100, 0).cast("long"))
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      case class UE(user_id: Long, ts: Timestamp, value: Double)
      val vRows = v.as[(Long, Timestamp, Double)].collect().toIndexedSeq
      val pRows = p.as[(Long, Timestamp, Double)].collect().toIndexedSeq
      val inV = MemoryStream[(Long, Timestamp, Double)]
      val inP = MemoryStream[(Long, Timestamp, Double)]
      val q = EventStreams.attributionJoin(
          inV.toDF().toDF("user_id", "ts", "value"),
          inP.toDF().toDF("user_id", "ts", "value"))
        .writeStream.format("memory").queryName("eq_attr")
        .outputMode(OutputMode.Append()).start()
      try {
        inV.addData(vRows); inP.addData(pRows)
        q.processAllAvailable()
        // sentinels push both watermarks past every interval's end
        val sTs = new Timestamp(maxEventTs.getTime + 86400000L)
        inV.addData((-1L, sTs, 0.0)); inP.addData((-1L, sTs, 0.0))
        q.processAllAvailable()
        val s2 = new Timestamp(sTs.getTime + 86400000L)
        inV.addData((-1L, s2, 0.0)); inP.addData((-1L, s2, 0.0))
        q.processAllAvailable()
        lastState = peakStateRows(q)
      } finally q.stop()
      val got = spark.table("eq_attr").filter(col("user_id") >= 0)
        .select(col("user_id"), col("view_ts"), col("purchase_ts"),
          round(col("purchase_value") * 100, 0).cast("long"))
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 6. sessionize vs batch q_sessionize on the real events table.
    check("sessionize") {
      val batch = graft.operators.Analytics.sessionize(spark, sfDir)
        .select(col("user_id"), col("n_events"), col("session_value"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val rows = events.select(col("user_id"), col("ts"), col("value"))
        .as[SessionEvent].collect().toIndexedSeq
      val s1 = new Timestamp(maxEventTs.getTime + 86400000L)
      val got = drain(rows, "eq_sess", OutputMode.Append(),
          sentinels = Seq(SessionEvent(-1L, s1, 0.0),
            SessionEvent(-1L, new Timestamp(s1.getTime + 86400000L), 0.0)))(in =>
          EventStreams.sessionize(in.toDS()).toDF())
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("n_events"),
          round(col("session_value") * 100, 0).cast("long"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 7. topkLeaderboard vs the batch per-window top-k.
    check("topkLeaderboard") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("wstart"), col("event_type"))
        .orderBy(col("v").desc, col("user_id"))
      val batch = events
        .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"),
          col("event_type"), col("user_id"))
        .agg(sum(col("value")).as("v"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= EventStreams.LeaderboardK)
        .select(col("wstart"), col("event_type"), col("rank").cast("long"),
          col("user_id"), round(col("v") * 100, 0).cast("long"))
        .as[(Timestamp, String, Long, Long, Long)].collect().toSeq.sorted
      val rows = events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[ScoredEvent].collect().toIndexedSeq
      val s1 = new Timestamp(maxEventTs.getTime + 86400000L)
      val got = drain(rows, "eq_topk", OutputMode.Append(),
          sentinels = Seq(ScoredEvent(-1L, s1, "__sentinel", 0.0),
            ScoredEvent(-1L, new Timestamp(s1.getTime + 86400000L), "__sentinel", 0.0)))(in =>
          EventStreams.topkLeaderboard(in.toDS()).toDF())
        .filter(col("user_id") >= 0)
        .select(col("window_start"), col("event_type"), col("rank"),
          col("user_id"), round(col("value") * 100, 0).cast("long"))
        .as[(Timestamp, String, Long, Long, Long)].collect().toSeq.sorted
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 8. qualityGate vs batch tx_gopher (one shared column definition).
    check("qualityGate") {
      val batch = graft.operators.Curation.txGopher(spark, sfDir)
        .select(col("doc_id"), col("fail_mask"), col("keep"))
        .as[(Long, Long, Long)].collect().toSet
      val got = drain(docEvents, "eq_qg", OutputMode.Append())(in =>
          EventStreams.qualityGate(in.toDS().toDF()))
        .select(col("doc_id"), col("fail_mask"), col("keep"))
        .as[(Long, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 8b. qualityClassifierGate vs batch tx_quality_classifier (one
    // shared column definition — the learned-filter twin of 8).
    check("qualityClassifierGate") {
      val batch = graft.operators.Curation.txQualityClassifier(spark, sfDir)
        .select(col("doc_id"), col("logit_micro"), col("clf_keep"))
        .as[(Long, Long, Long)].collect().toSet
      val got = drain(docEvents, "eq_qcg", OutputMode.Append())(in =>
          EventStreams.qualityClassifierGate(in.toDS().toDF()))
        .select(col("doc_id"), col("logit_micro"), col("clf_keep"))
        .as[(Long, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 9. contaminationGate vs the identical stateless algebra batch-driven
    // (benchmark side = the same every-25th-doc frame tx_contamination
    // blocks against).
    check("contaminationGate") {
      val bench = docsDf.filter(col("doc_id") % 25 === 0).select(col("text"))
      val batch = EventStreams.contaminationGate(docsDf, bench)
        .select(col("doc_id"), col("n_shared"))
        .as[(Long, Long)].collect().toSet
      val got = drain(docEvents, "eq_cg", OutputMode.Append())(in =>
          EventStreams.contaminationGate(in.toDS().toDF(), bench))
        .select(col("doc_id"), col("n_shared"))
        .as[(Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 10. promptConstraintGate vs batch rw_prompt_parse on the real prompts.
    check("promptConstraintGate") {
      val batch = graft.operators.Rewards.rwPromptParse(spark, sfDir)
        .select(col("doc_id"), col("structure_req"), col("topic"),
          col("tone_req"), col("length_req"), col("emoji_req"))
        .as[(Long, String, String, String, String, String)].collect().toSet
      val prompts = graft.operators.Style.p18Prompts(spark, sfDir)
        .collect().map(r => DocEvent(r.getLong(0), t("2026-01-01 10:00:00"), r.getString(1)))
        .toIndexedSeq
      val got = drain(prompts, "eq_pg", OutputMode.Append())(in =>
          EventStreams.promptConstraintGate(
            in.toDS().toDF().withColumnRenamed("text", "prompt")))
        .select(col("doc_id"), col("structure_req"), col("topic"),
          col("tone_req"), col("length_req"), col("emoji_req"))
        .as[(Long, String, String, String, String, String)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 11. piiGate vs batch piiProject, real docs + PII-bearing fixtures
    // (the synthetic corpus is pattern-clean; the fixtures make the
    // comparison non-vacuous — the tx_pattern_canary lesson).
    check("piiGate") {
      val fixtures = Seq(
        (1000000L, "mail jane.doe@example.com or visit https://x.io/a"),
        (1000001L, "call +1 555-867-5309 from 10.0.0.1"))
      val all = docsDf.as[(Long, String)].collect().toSeq ++ fixtures
      val batch = graft.operators.TextOps.piiProject(all.toDF("doc_id", "text"))
        .select(col("doc_id"), col("n_url"), col("n_email"), col("n_ip"),
          col("n_phone"), col("n_pii"), col("red_fp"))
        .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSet
      val rows = all.map { case (id, tx) => DocEvent(id, t("2026-01-01 10:00:00"), tx) }
        .toIndexedSeq
      val got = drain(rows, "eq_pii", OutputMode.Append())(in =>
          EventStreams.piiGate(in.toDS().toDF()))
        .select(col("doc_id"), col("n_url"), col("n_email"), col("n_ip"),
          col("n_phone"), col("n_pii"), col("red_fp"))
        .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 12. boilerplateGate vs batch tx_boilerplate through the persisted
    // heavy-set artifact (the train/use split).
    check("boilerplateGate") {
      val path = java.nio.file.Files.createTempDirectory("streameq_boiler").toString + "/art"
      graft.operators.TextOps.writeBoilerplateArtifact(spark, sfDir, path)
      val heavy = spark.read.parquet(path)
      val batch = graft.operators.TextOps.txBoilerplate(spark, sfDir)
        .select(col("doc_id"), col("n_blocks"), col("n_boiler"),
          col("n_kept_tokens"), col("text_clean"))
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val got = drain(docEvents, "eq_bg", OutputMode.Append())(in =>
          EventStreams.boilerplateGate(in.toDS().toDF(), heavy))
        .select(col("doc_id"), col("n_blocks"), col("n_boiler"),
          col("n_kept_tokens"), col("text_clean"))
        .as[(Long, Long, Long, Long, String)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 13. cmsCounters: stream-accumulated counters equal the one-shot
    // batch sketch (counter addition commutes across triggers).
    check("cmsCounters") {
      val batch = EventStreams.cmsCounters(docsDf
          .select(col("doc_id"), lit(t("2026-01-01 10:00:00")).as("ts"), col("text")))
        .as[(Int, Long, Long)].collect().toSet
      val got = drain(docEvents, "eq_cms", OutputMode.Complete(), nBatches = 3)(in =>
          EventStreams.cmsCounters(in.toDS().toDF()))
        .as[(Int, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 14. nearDupPairs vs batch dd_simhash (pair-set equality; cross-band
    // collisions dedup downstream, so compare DISTINCT pairs).
    check("nearDupPairs") {
      val batch = graft.operators.Dedup.ddSimhash(spark, sfDir)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .as[(Long, Long, Long)].collect().toSet
      val got = drain(docEvents, "eq_ndp", OutputMode.Append(), nBatches = 1)(in =>
          EventStreams.nearDupPairs(in.toDS()).toDF())
        .select(col("id_a"), col("id_b"), col("hamming"))
        .as[(Long, Long, Long)].collect().toSet
      // At replica-dense stress corpora the per-bucket BucketCap binds
      // (bounded state trades recall — the documented contract); the
      // record then must show every emitted pair is REAL (subset) and
      // how much recall the cap cost, not just a bare inequality.
      if (got != batch) {
        val common = (got & batch).size
        lastNote = Some(s"subset=${common == got.size} " +
          s"recall_ppm=${common.toLong * 1000000L / math.max(batch.size, 1)} " +
          s"bucket_cap=${EventStreams.BucketCap}")
      }
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 14b. packSequences vs batch tx_pack: ordered ingest across 3
    // micro-batches — the single-long carry-over state packs across
    // batch boundaries into exactly the batch operator's sequences.
    check("packSequences") {
      val batch = graft.operators.TextOps.txPack(spark, sfDir)
        .select(col("doc_id"), col("n_tokens"), col("seq_id"))
        .as[(Long, Long, Long)].collect().toSet
      val ordered = docEvents.sortBy(_.doc_id)
      val got = drain(ordered, "eq_pack", OutputMode.Append(), nBatches = 3)(in =>
          EventStreams.packSequences(in.toDS()).toDF())
        .select(col("doc_id"), col("n_tokens"), col("seq_id"))
        .as[(Long, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 15. annTopk over the persisted PQ index vs batch ss_ivf_pq.
    check("annTopk") {
      val path = java.nio.file.Files.createTempDirectory("streameq_pq").toString + "/pq"
      graft.operators.Similarity.writePqArtifact(spark, sfDir, path)
      val batch = graft.operators.Similarity.ssIvfPq(spark, sfDir)
        .select(col("q_id"), col("rank"), col("vec_id"), col("adc_micro"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), lit(t("2026-01-01 10:00:00")).as("ts"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
        .as[AnnQuery].collect().toIndexedSeq
      val got = drain(queries, "eq_ann", OutputMode.Append())(in =>
          EventStreams.annTopk(in.toDS(), path).toDF())
        .select(col("q_id"), col("rank"), col("vec_id"), col("adc_micro"))
        .as[(Long, Long, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 16. incrementalVerdictFragments + reduce vs batch dd_incremental.
    check("incrementalVerdicts") {
      val batch = graft.operators.Dedup.ddIncremental(spark, sfDir)
        .as[(Long, String, Long, Long)].collect().toSet
      val all = docsDf.as[(Long, String)].collect()
      val base = all.filter(_._1 % 10 != 0).toIndexedSeq
        .map(r => IncDocEvent(r._1, t("2026-01-01 09:00:00"), r._2, is_base = true))
      val arriving = all.filter(_._1 % 10 == 0).toIndexedSeq
        .map(r => IncDocEvent(r._1, t("2026-01-01 10:00:00"), r._2, is_base = false))
      val in = MemoryStream[IncDocEvent]
      val q = EventStreams.incrementalVerdictFragments(in.toDS())
        .writeStream.format("memory").queryName("eq_inc")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(base); q.processAllAvailable()
        in.addData(arriving); q.processAllAvailable()
        lastState = peakStateRows(q)
      } finally q.stop()
      val batchIds = arriving.map(_.doc_id).toDF("doc_id")
      val got = EventStreams.reduceIncrementalVerdicts(
          spark.table("eq_inc"), batchIds)
        .as[(Long, String, Long, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    // 17. Sinks.streamingParquet: AvailableNow drain is exactly-once —
    // the drained file set holds each event id exactly once, and a
    // second drain with no new data appends nothing.
    check("sink_streamingParquet") {
      val dir = java.nio.file.Files.createTempDirectory("streameq_sink").toString
      val ids = events.select(col("event_id")).as[Long].collect().toSet
      val rows = events.select(col("event_id"), col("event_type"))
        .as[(Long, String)].collect().toIndexedSeq
      val in = MemoryStream[(Long, String)]
      in.addData(rows)
      val q = graft.sources.Sinks.streamingParquet(
        in.toDF().toDF("event_id", "event_type"), s"$dir/out", s"$dir/ckpt").start()
      q.awaitTermination(120000)
      val q2 = graft.sources.Sinks.streamingParquet(
        in.toDF().toDF("event_id", "event_type"), s"$dir/out", s"$dir/ckpt").start()
      q2.awaitTermination(120000)
      val got = spark.read.parquet(s"$dir/out").select(col("event_id"))
        .as[Long].collect()
      (got.length.toLong, ids.size.toLong,
        got.length == ids.size && got.toSet == ids)
    }

    // 18. Sinks.dedupUpsertParquet vs batch dd_exact: redelivered docs
    // across two drains collapse to exactly dd_exact's keep set.
    check("sink_dedupUpsertParquet") {
      val dir = java.nio.file.Files.createTempDirectory("streameq_upsert").toString
      val batch = graft.operators.Dedup.ddExact(spark, sfDir)
        .select(col("fp"), col("keep_id"))
        .as[(String, Long)].collect().toSet
      val rows = docsDf
        .select(graft.functions.NativeExpressions.fingerprint(col("text")).as("fp"),
          col("doc_id"))
        .as[(String, Long)].collect().toIndexedSeq
      val in = MemoryStream[(String, Long)]
      def drainOnce(): Unit = {
        val q = graft.sources.Sinks.dedupUpsertParquet(
          in.toDF().toDF("fp", "doc_id"), s"$dir/out", s"$dir/ckpt", "fp", "doc_id").start()
        q.awaitTermination(120000)
      }
      in.addData(rows); drainOnce()
      in.addData(rows.take(rows.length / 2)); drainOnce() // redelivery
      val got = spark.read.parquet(s"$dir/out")
        .select(col("fp"), col("doc_id")).as[(String, Long)].collect().toSet
      (got.size.toLong, batch.size.toLong, got == batch)
    }

    results
    } // runAll

    def entriesJson(rs: scala.collection.mutable.LinkedHashMap[
        String, (Long, Long, Boolean, Long, Option[String])]): String =
      rs.map { case (k, (s, b, eq, st, msg)) =>
        val e = msg.filter(_.startsWith("ERR "))
          .map(m => Json.quote(m.stripPrefix("ERR "))).getOrElse("null")
        val note = msg.filterNot(_.startsWith("ERR "))
          .map(m => s""","note":${Json.quote(m)}""").getOrElse("")
        s""""$k":{"stream_rows":$s,"batch_rows":$b,"equal":$eq,"max_state_rows":$st,"err":$e$note}"""
      }.mkString(",")

    val results = runAll(sfDir, Set.empty)
    val n = results.size
    val nEq = results.values.count(_._3)

    // Stress section (r11 verdict item 6): the stateful entries re-run
    // on a larger corpus with peak state-store rows recorded — the
    // file-verifiable evidence for the bounded-state claims (watermark
    // eviction, per-group top-k caps, banded-fp state).
    var stressOk = true
    val stressJson = sys.env.get("SPARK_GRAFT_STRESS_SF_DIR").map { sd =>
      val stateful = Set("sessionize", "topkLeaderboard", "nearDupPairs",
        "annTopk", "incrementalVerdicts", "dedupEvents", "attributionJoin",
        "packSequences")
      val sr = runAll(sd, stateful)
      val sEq = sr.values.count(_._3)
      // Gate the exit status on the stress section too: every entry
      // must be equal, except nearDupPairs may be capped-unequal ONLY
      // with subset=true AND recall at/above the floor (r12 ADVICE: a
      // bare subset exemption lets a cap/state regression that collapses
      // recall to near zero still exit 0) — a stress regression must not
      // exit 0.
      stressOk = sr.forall { case (name, (_, _, eq, _, msg)) =>
        eq || (name == "nearDupPairs" && msg.exists { m =>
          m.startsWith("subset=true") &&
            "recall_ppm=(\\d+)".r.findFirstMatchIn(m)
              .exists(_.group(1).toLong >= NdpRecallFloorPpm)
        })
      }

      // Cap-vs-recall/state curve (r12 verdict item 2): nearDupPairs
      // re-run at a sweep of BucketCap values against the stress
      // corpus's batch dd_simhash pair set — the measured basis for the
      // default cap. max_state_rows is the bucket count (cap-invariant);
      // state_bytes is the axis the cap actually moves.
      val docEventsS = Tables.documents(spark, sd).select(col("doc_id"), col("text"))
        .select(col("doc_id"), lit(t("2026-01-01 10:00:00")).as("ts"), col("text"))
        .as[DocEvent].collect().toIndexedSeq
      val batchPairs = graft.operators.Dedup.ddSimhash(spark, sd)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .as[(Long, Long, Long)].collect().toSet
      val curve = Seq(128, 256, 512, 1024, 2048).map { cap =>
        val in = MemoryStream[DocEvent]
        val q = EventStreams.nearDupPairs(in.toDS(), cap).toDF()
          .writeStream.format("memory").queryName(s"ndp_cap_$cap")
          .outputMode(OutputMode.Append()).start()
        var peakRows = -1L; var peakBytes = -1L
        try {
          in.addData(docEventsS); q.processAllAvailable()
          peakRows = peakStateRows(q)
          peakBytes = q.recentProgress.iterator
            .flatMap(_.stateOperators.map(_.memoryUsedBytes))
            .foldLeft(-1L)(math.max)
        } finally q.stop()
        val got = spark.table(s"ndp_cap_$cap")
          .select(col("id_a"), col("id_b"), col("hamming"))
          .as[(Long, Long, Long)].collect().toSet
        val recall = (got & batchPairs).size.toLong * 1000000L /
          math.max(batchPairs.size, 1)
        System.err.println(s"[streameq] ndp_curve cap=$cap pairs=${got.size} " +
          s"recall_ppm=$recall subset=${got.subsetOf(batchPairs)} state_bytes=$peakBytes")
        s"""{"cap":$cap,"pairs":${got.size},"recall_ppm":$recall,""" +
          s""""subset":${got.subsetOf(batchPairs)},"max_state_rows":$peakRows,""" +
          s""""state_bytes":$peakBytes}"""
      }.mkString("[", ",", "]")

      s""","stress":{"sf_dir":${Json.quote(sd)},"n_entries":${sr.size},"n_equal":$sEq,""" +
        s""""ndp_default_cap":${EventStreams.BucketCap},""" +
        s""""ndp_recall_floor_ppm":$NdpRecallFloorPpm,""" +
        s""""ndp_curve":$curve,"entries":{${entriesJson(sr)}}}"""
    }.getOrElse("")

    val json = s"""{"entries":{${entriesJson(results)}},"n_entries":$n,"n_equal":$nEq,"sf":${Json.quote(sfDir)}$stressJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
    if (nEq != n || !stressOk) sys.exit(1)
  }
}
