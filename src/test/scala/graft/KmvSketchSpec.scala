package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.Aggregates
import graft.operators.Analytics

/** Pins the KMV distinct sketch's contract: exact below k, the
  * (k−1)·2³²/h₍ₖ₎ estimator at/above, merge-order independence (the
  * property the DuckDB oracle mirror depends on), accuracy within the
  * 1/√k band on the real events table, and the analyzer-time type gate.
  */
class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  private val K = 64

  private def hashed(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).toDF("v").select(
      conv(substring(md5(concat(lit("t#"), col("v").cast("string"))), 1, 8),
        16, 10).cast("long").as("h"))

  test("exact count below k, estimator at/above") {
    val below = hashed(K - 1)
      .agg(Aggregates.kmvDistinct(col("h"), K)).head.getLong(0)
    assert(below == K - 1, s"below-k must be exact, got $below")
    // at n = k the estimator engages: (k-1)*2^32 / kth-smallest — compute
    // the expected value independently from the same hashes
    val hs = hashed(K).as[Long].collect().sorted
    val expected = (K - 1).toLong * (1L << 32) / math.max(hs.last, 1L)
    val got = hashed(K).agg(Aggregates.kmvDistinct(col("h"), K)).head.getLong(0)
    assert(got == expected, s"estimator mismatch: got $got, expected $expected")
  }

  test("merge-order independent: any partitioning yields the same estimate") {
    val df = hashed(5000)
    val one = df.repartition(1).agg(Aggregates.kmvDistinct(col("h"), K)).head.getLong(0)
    val many = df.repartition(13).agg(Aggregates.kmvDistinct(col("h"), K)).head.getLong(0)
    val skew = df.repartition(64, col("h") % 3).agg(Aggregates.kmvDistinct(col("h"), K))
      .head.getLong(0)
    assert(one == many && many == skew,
      s"estimate depends on partitioning: $one / $many / $skew")
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val df = hashed(1000)
    val once = df.agg(Aggregates.kmvDistinct(col("h"), K)).head.getLong(0)
    val tripled = df.union(df).union(df)
      .agg(Aggregates.kmvDistinct(col("h"), K)).head.getLong(0)
    assert(once == tripled, s"duplicate rows moved the estimate: $once vs $tripled")
  }

  test("estimates track exact distinct within the 1/sqrt(k) band on real events") {
    // deterministic corpus + deterministic hash ⇒ a fixed deviation; 3/√k
    // (~37%) is the loose bound that only breaks if the estimator or the
    // hash scheme changes, not with run-to-run noise (there is none)
    val ev = Tables.events(spark, sfDir)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
    val est = ev.select(col("event_type"),
        graft.functions.Aggregates.kmvHash(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(Aggregates.kmvDistinct(col("h"), K).as("nhat"))
    val worst = exact.join(est, "event_type")
      .select(max(expr("abs(nhat - n) * 1000L div n"))).head.getLong(0)
    assert(worst <= 3000L / math.sqrt(K).toLong,
      s"worst relative deviation ${worst} permille exceeds 3/sqrt(k)")
  }

  test("q_approx_distinct exercises BOTH branches at the gate SF") {
    // the correctness gate runs at sf0.01 where per-(type, day) distinct
    // counts straddle k=64 — if data or k drift so one branch goes
    // vacuous, this fails loudly rather than silently weakening the gate
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val perGroup = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")))
      .agg(countDistinct(col("user_id")).as("n"))
    assert(perGroup.filter(col("n") < Analytics.KmvK).count() > 0,
      "no group below k: exact branch vacuous at gate SF")
    assert(perGroup.filter(col("n") >= Analytics.KmvK).count() > 0,
      "no group at/above k: estimator branch vacuous at gate SF")
  }

  test("non-BIGINT input fails analysis, not runtime") {
    val err = intercept[AnalysisException] {
      Seq("a", "b").toDF("s").agg(Aggregates.kmvDistinct(col("s"), K)).head
    }
    assert(err.getMessage.contains("BIGINT"))
  }
}
