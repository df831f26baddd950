package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan dump for ONE query (PlanDump writes the summary
  * table for all of them): runMain graft.DebugPlan <query> [sfDir]. AQE
  * off so exchanges/codegen spans are concrete. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("tx_corpus_novelty")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // scalastyle:off println
    println(df.queryExecution.executedPlan.toString)
    // scalastyle:on println
    spark.stop()
  }
}
