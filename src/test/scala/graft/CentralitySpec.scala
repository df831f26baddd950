package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ss_centrality's integer PageRank: hand-computed fixed points on toy
  * graphs (the arithmetic contract the oracle unrolls), then the
  * corpus-level permutation/coverage invariants.
  */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def pr(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Similarity.pageRank(nodes.toDF("vec_id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric cycle is the uniform fixed point") {
    // deg=1 everywhere: contribution = rank, damped 850000 + 150000 = rank.
    val r = pr(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("star graph matches the hand-unrolled damped ranks; dangling mass drops") {
    // 1→2, 3→2; node 2 is dangling. After round 1 the spokes settle at
    // the teleport floor 150000; every later round gives node 2
    // 150000 + (2·150000·85) div 100 = 405000.
    val r = pr(Seq(1L, 2L, 3L), Seq((1L, 2L), (3L, 2L)))
    assert(r == Map(1L -> 150000L, 2L -> 405000L, 3L -> 150000L))
  }

  test("integer division truncates per-edge, not per-sum") {
    // node 1 has deg 3: each edge carries rank div 3 (truncated
    // per-edge). Sources 1 and 4 settle at the 150000 floor after round
    // 1, so rounds 2 and 3 are identical: node 2 receives
    // 150000 div 3 + 150000 = 200000 → 150000 + (200000·85) div 100 =
    // 320000; nodes 3/5 receive 50000 → 192500. The 333 ppm lost to the
    // three-way truncation is visible in 192500 (vs 192500.4… exact).
    val r = pr(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (1L, 3L), (1L, 5L), (4L, 2L)))
    assert(r == Map(1L -> 150000L, 2L -> 320000L, 3L -> 192500L,
      4L -> 150000L, 5L -> 192500L))
  }

  test("ss_centrality is a full-coverage rank permutation over the corpus") {
    val out = Similarity.ssCentrality(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.length.toLong == n)
    assert(out.map(_.getAs[Long]("rank")).toSet == (1L to n).toSet)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length.toLong == n)
    out.foreach { r =>
      // teleport floor, and nobody holds more than the whole graph's mass
      assert(r.getAs[Long]("pr_ppm") >= 150000L)
      assert(r.getAs[Long]("pr_ppm") <= n * 1000000L)
      assert(r.getAs[Long]("in_deg") >= 0L)
    }
    // total in-degree is the edge count: ≤ TopK per source vector
    val totalIn = out.map(_.getAs[Long]("in_deg")).sum
    assert(totalIn <= n * Similarity.TopK)
    assert(totalIn > 0L)
  }
}
