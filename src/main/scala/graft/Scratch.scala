package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway experiment main — NOT part of the library; deleted before commit.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    def selfJoin(): org.apache.spark.sql.DataFrame = {
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      val d = li.distinct()
      d.as("a").join(d.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(100)
    }

    def selfJoinCp(): org.apache.spark.sql.DataFrame = {
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      val d = li.distinct().localCheckpoint(false)
      val mb = d.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      assert(mb < 100)
      d.as("a").join(d.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(100)
    }

    // warmup scan
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").agg(sum("l_quantity"))
      .write.format("noop").mode("overwrite").save()

    for (i <- 1 to 3) {
      time(s"current[$i]") {
        graft.operators.Analytics.marketBasket(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"selfjoin[$i]") { selfJoin().write.format("noop").mode("overwrite").save() }
      time(s"selfjoinCp[$i]") { selfJoinCp().write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
