package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** hashRank must equal the naive single-window rank — it is the
  * correctness backbone of p05_balance and p23_split. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashRank == row_number over (hash, tie) for every group") {
    // deterministic pseudo-random rows: 2000 ids over 7 groups
    val df = (1 to 2000).map(i => (i.toLong, s"g${i % 7}")).toDF("id", "grp")
      .repartition(8)
    val h = md5(concat(lit("t#"), col("id").cast("string")))
    val ranked = Sampling.hashRank(df, Seq("grp"), h, col("id"), "rank")
    val naive = df
      .withColumn("exp_rank", row_number().over(
        Window.partitionBy(col("grp")).orderBy(h, col("id"))))
    val diff = ranked.join(naive, Seq("id", "grp"))
      .filter(col("rank") =!= col("exp_rank"))
      .count()
    assert(diff == 0)
  }

  test("hashRank ranks are a 1..n permutation per group") {
    val df = (1 to 500).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val ranked = Sampling.hashRank(df, Seq("grp"),
      md5(col("id").cast("string")), col("id"), "rank")
    val bad = ranked.groupBy("grp")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        countDistinct(col("rank")).as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
      .count()
    assert(bad == 0)
  }
}
