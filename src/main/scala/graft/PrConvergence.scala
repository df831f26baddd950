package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main: PageRank iteration-count convergence — the record
  * justifying ss_centrality's FIXED [[operators.Similarity.PrIters]]
  * rounds (a fixed count keeps the result a pure function of the edge
  * set and lets the oracle unroll the same joins; this main shows what
  * the fixed count costs in rank accuracy).
  *
  * For each iteration count i in 1..max it recomputes the integer-exact
  * rank vector over the SAME session-cached knn edge set and reports,
  * per consecutive pair (i-1, i): max/mean |Δrank| in ppm of the
  * teleport-normalized score, the number of positions where the strict
  * global ordering (pr desc, vec_id) moved, and the top-100 overlap.
  * One JSON line on stdout — redirect to PRCONV_r{N}.json.
  */
object PrConvergence {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val maxIters = sys.env.getOrElse("SPARK_GRAFT_PR_MAX_ITERS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_MAX_CENTROIDS").foreach { k =>
      spark.conf.set(graft.operators.Similarity.MaxCentroidsKey, k)
    }

    // One cached edge build (ssKnnGraph's session cache), then each
    // iteration count is PrIters' own linear join-aggregate rounds.
    val edges = operators.Similarity.ssKnnGraph(spark, sfDir)
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
    val nodes = operators.Sampling.trackScratch(
      Tables.embeddings(spark, sfDir).select(col("vec_id"))
        .localCheckpoint(true))

    def ranked(iters: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("r").desc, col("vec_id"))
      operators.Similarity.pageRank(nodes, edges, iters)
        .withColumn("pos", row_number().over(w).cast("long"))
        .localCheckpoint(true)
    }

    var prev = ranked(1)
    val rows = (2 to maxIters).map { i =>
      val cur = ranked(i)
      val j = prev.select(col("vec_id"), col("r").as("r0"), col("pos").as("p0"))
        .join(cur.select(col("vec_id"), col("r"), col("pos")), "vec_id")
      val agg = j.agg(
        max(abs(col("r") - col("r0"))).as("max_d"),
        avg(abs(col("r") - col("r0"))).as("mean_d"),
        sum(when(col("pos") =!= col("p0"), 1L).otherwise(0L)).as("moved"),
        count(lit(1)).as("n")).collect()(0)
      val top100 = prev.filter(col("pos") <= 100).select("vec_id")
        .join(cur.filter(col("pos") <= 100).select("vec_id"), "vec_id")
        .count()
      prev = cur
      f"""{"iters":$i,"max_delta_ppm":${agg.getLong(0)},""" +
        f""""mean_delta_ppm":${agg.getDouble(1)}%.1f,""" +
        s""""order_moved":${agg.getLong(2)},"n":${agg.getLong(3)},""" +
        s""""top100_overlap":$top100}"""
    }
    println(s"""{"metric":"pr_convergence","sf_dir":${Json.quote(sfDir)},""" +
      s""""pr_iters_fixed":${operators.Similarity.PrIters},""" +
      s""""steps":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
