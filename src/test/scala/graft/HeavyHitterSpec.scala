package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** tx_heavy_hitters' count-min sketch: the one-sided error contract
  * (estimates never undercount — so no true heavy hitter can be missed)
  * under forced bucket collisions, plus the corpus-level recall check
  * against an exact recount.
  */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  private def cms(docs: Seq[String]) =
    TextOps.hhCms(docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))

  test("est >= exact for every token, even under heavy collision pressure") {
    // 3000 distinct tokens across 4×1024 counters forces collisions in
    // every row; the min-of-rows estimate must still never undercount.
    val docs = (0 until 3000).map(i => s"tok$i hot hot")
    val rows = cms(docs).collect()
    assert(rows.length == 3001)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact_tf"), r.toString)
    }
    val hot = rows.find(_.getAs[String]("tok") == "hot").get
    assert(hot.getAs[Long]("exact_tf") == 6000L)
    assert(hot.getAs[Long]("est") >= 6000L)
  }

  test("no true heavy hitter is missed at corpus level (sf0.001 recount)") {
    val out = TextOps.txHeavyHitters(spark, sfDir).collect()
    val exact = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= TextOps.HhThreshold)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("tf")).toMap
    val got = out.map(r => r.getAs[String]("tok")).toSet
    // one-sided error ⇒ everything truly frequent surfaces
    assert(exact.keySet.subsetOf(got))
    // and each reported exact_tf matches the recount where both exist
    out.foreach { r =>
      exact.get(r.getAs[String]("tok")).foreach { tf =>
        assert(r.getAs[Long]("exact_tf") == tf)
      }
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact_tf"))
    }
    // output is est-descending with the declared tie-break
    val ests = out.map(r => (-r.getAs[Long]("est"), r.getAs[String]("tok"))).toSeq
    assert(ests == ests.sorted)
  }
}
