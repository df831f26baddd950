package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main: dd_substring's span-df cap vs pair recall — the
  * record behind the [[operators.Dedup.MaxSpanDf]] default (the same
  * cap-vs-recall discipline the streaming nearDupPairs BucketCap got in
  * r13). A span shared by more than `cap` documents becomes a stop-span
  * and its pairs are only found through some OTHER rarer shared span,
  * so a larger cap finds a strict superset of (id_a, id_b) pairs and
  * recall against the largest swept cap ("converged truth" — the last
  * two sweep points must agree for the reference to be meaningful) is a
  * plain count ratio.
  *
  * Emits one JSON line (redirect to SPANCAP_r{N}.json) and exits
  * non-zero if the DEFAULT cap's recall sits under the floor
  * (SPARK_GRAFT_SPAN_RECALL_FLOOR ppm, default 950000) — a cap/blocker
  * regression fails loudly instead of being quietly recorded.
  */
object SpanCapCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val floorPpm = sys.env.get("SPARK_GRAFT_SPAN_RECALL_FLOOR")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption).getOrElse(950000L)
    val caps = sys.env.get("SPARK_GRAFT_SPAN_CAPS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(12, 25, 50, 100, 200, 400, 800, 1600))
      .sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        SessionTuning.objectAggFallbackThreshold(cpus.toInt,
          sys.env.get("SPARK_EXECUTOR_MEMORY")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = caps.map { cap =>
      val t0 = System.nanoTime()
      val n = operators.Dedup.ddSubstringPairs(spark, sfDir, cap).count()
      val sec = (System.nanoTime() - t0) / 1e9
      operators.Sampling.releaseScratch(blocking = true)
      System.err.println(f"[spancap] cap=$cap%-6d pairs=$n%-12d $sec%.2f s")
      (cap, n, sec)
    }
    val truth = rows.last._2.max(1L)
    val converged = rows.size < 2 ||
      rows(rows.size - 2)._2 == rows.last._2
    val defCap = operators.Dedup.MaxSpanDf
    val defRecallPpm = rows.find(_._1 == defCap)
      .map(_._2 * 1000000L / truth).getOrElse(-1L)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val capsJson = rows.map { case (cap, n, sec) =>
      s"""{"cap":$cap,"pairs":$n,"recall_ppm":${n * 1000000L / truth},""" +
        s""""sec":${fmt(sec)}}"""
    }.mkString(",")
    println(s"""{"metric":"span_cap_curve","sf_dir":${Json.quote(sfDir)},""" +
      s""""default_cap":$defCap,"default_recall_ppm":$defRecallPpm,""" +
      s""""floor_ppm":$floorPpm,"truth_converged":$converged,""" +
      s""""caps":[$capsJson]}""")
    spark.stop()
    // Three distinct failure modes, each loud and distinguishable
    // (r14 advice: an unconverged sweep silently undercounts truth and
    // INFLATES every recall_ppm, and a sweep missing the default cap
    // produced a misleading "FLOOR VIOLATION" for defRecallPpm = -1).
    if (!converged) {
      System.err.println(s"[spancap] TRUTH NOT CONVERGED: the two largest " +
        s"swept caps still disagree (${rows(rows.size - 2)._2} vs " +
        s"${rows.last._2} pairs) — recall_ppm is inflated; extend the sweep")
      sys.exit(2)
    }
    if (defRecallPpm < 0) {
      System.err.println(s"[spancap] DEFAULT CAP NOT IN SWEEP: caps " +
        s"${caps.mkString(",")} do not include MaxSpanDf=$defCap — no " +
        "floor verdict possible")
      sys.exit(3)
    }
    if (defRecallPpm < floorPpm) {
      System.err.println(s"[spancap] FLOOR VIOLATION: default cap $defCap " +
        s"recall $defRecallPpm ppm < floor $floorPpm ppm")
      sys.exit(1)
    }
  }
}
