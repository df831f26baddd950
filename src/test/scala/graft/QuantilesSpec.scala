package graft

import org.apache.spark.sql.functions._

import graft.functions.Quantiles
import graft.operators.{DocPipeline, TextOps}

/** The approx-quantile knob must (a) actually switch the plan to
  * approx_percentile and (b) produce cutoffs close enough to exact that
  * tiering barely moves — the property that makes the 100 TB swap safe. */
class QuantilesSpec extends SparkSpec {

  private def withApprox[A](f: => A): A = {
    spark.conf.set(Quantiles.ApproxKey, "true")
    try f finally spark.conf.unset(Quantiles.ApproxKey)
  }

  test("the knob switches percentile to approx_percentile in the plan") {
    val exact = TextOps.txQualityDist(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val approx = withApprox {
      TextOps.txQualityDist(spark, sfDir)
        .queryExecution.optimizedPlan.toString
    }
    assert(exact.contains("percentile") && !exact.contains("approx_percentile"))
    assert(approx.contains("approx_percentile"))
  }

  test("approx p01 tiering agrees with exact on almost every document") {
    val exact = DocPipeline.p01Engagement(spark, sfDir)
      .select("doc_id", "tier").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val approx = withApprox {
      DocPipeline.p01Engagement(spark, sfDir)
        .select("doc_id", "tier").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val agree = exact.count { case (id, t) => approx(id) == t }
    // At accuracy 10000 the cutoff estimate can only shift boundary docs.
    assert(agree >= (exact.size * 0.98).toInt,
      s"only $agree/${exact.size} documents tier identically under approx quantiles")
  }
}
