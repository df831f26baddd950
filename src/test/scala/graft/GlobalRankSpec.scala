package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sampling.globalRank differential: the two-phase range-partitioned
  * form must equal the single-window `row_number() OVER (ORDER BY ...)`
  * (and running sum) on every row, including sort keys that collide on
  * the primary column and skewed key distributions.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int) = {
    // primary key collides heavily (mod 7) — the unique id tie-break is
    // what makes the order strict, exactly the caller contract
    (0 until n).map(i => (i.toLong, (i * 2654435761L % 7), (i % 13 + 1).toLong))
      .toDF("id", "score", "weight")
  }

  test("rank equals the single-window form under a strict order") {
    val df = fixture(500)
    val got = Sampling.globalRank(df, Seq(col("score").desc), col("id"), "rank")
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("running sum equals the single-window cumsum") {
    val df = fixture(500)
    val got = Sampling.globalRank(df, Seq(col("score")), col("id"), "rank",
        cumOf = Some((col("weight"), "cum")))
      .select($"id", $"rank", $"cum").as[(Long, Long, Long)].collect().toSet
    val w = Window.orderBy(col("score"), col("id"))
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("weight")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"rank", $"cum").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("two independent ranks joined on rank stay a consistent bijection") {
    // The round-10 corruption repro: two globalRank frames over the
    // same input, different sort orders, joined on the rank — the
    // p20_importance permutation-pairing shape. Before the ranged-frame
    // checkpoint, the offsets branch and the rank branch could evaluate
    // the range exchange separately with DIFFERENT sampled boundaries
    // (the sampler is seeded per RDD id), silently corrupting ranks in
    // exactly this multi-consumer plan while every standalone
    // evaluation stayed correct. The invariant: the join must be a
    // complete bijection and each side's payload multiset must survive.
    val df = fixture(5000).select($"id", $"weight")
    val a = Sampling.globalRank(df, Seq.empty, col("id"), "__r")
    val b = Sampling.globalRank(
        df.select($"id".as("bid"), $"weight".as("bweight"))
          .withColumn("__h", md5(col("bid").cast("string"))),
        Seq(col("__h")), col("bid"), "__r")
      .select($"__r", $"bid", $"bweight")
    val j = a.join(b, "__r")
    val row = j.agg(
      count(lit(1)), countDistinct($"__r"), countDistinct($"bid"),
      sum($"weight"), sum($"bweight")).head
    assert(row.getLong(0) == 5000 && row.getLong(1) == 5000 &&
      row.getLong(2) == 5000, s"join not a bijection: $row")
    assert(row.getLong(3) == row.getLong(4),
      s"payload multiset corrupted across the rank join: $row")
  }

  test("ranks are a permutation of 1..n even when one key dominates") {
    // 90% of rows share the top score: range partitions split the run
    // of equal primary keys; the id tie-break must keep ranks exact
    val df = (0 until 300).map(i => (i.toLong, if (i % 10 == 0) i.toLong else -1L))
      .toDF("id", "score")
    val got = Sampling.globalRank(df, Seq(col("score").desc), col("id"), "rank")
      .select($"rank").as[Long].collect().sorted.toSeq
    assert(got == (1L to 300L))
  }
}
