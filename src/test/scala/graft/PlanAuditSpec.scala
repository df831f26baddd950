package graft

/** Scale-regression guards: every SparkEntry query's physical plan must be
  * free of unconditional cartesian products, and the interval operators
  * must plan as equi-joins on their chunk keys (the O(N·M) theta-join
  * shape is exactly what the chunked design exists to avoid). */
class PlanAuditSpec extends SparkSpec {

  // Brute-force top-k IS corpus × broadcast-query-set by definition —
  // the bounded cross product is the operator contract, not a regression.
  private val allowedCross = Set("ss_brute_topk")

  test("no query plans a CartesianProduct or BroadcastNestedLoop with a real right side") {
    SparkEntry.queries.foreach { case (name, q) =>
      if (name != "p21_kmeans" && !allowedCross(name)) { // kmeans: iterative MLlib training, not one plan
        val plan = q(spark, sfDir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n$plan")
        // BroadcastNestedLoopJoin is acceptable only for single-row
        // broadcasts: a keyless (global) aggregate — collected
        // centroid/query arrays, quantile cutoffs — always yields
        // exactly one row.
        if (plan.contains("BroadcastNestedLoopJoin"))
          assert(plan.contains("keys=[], functions="),
            s"$name nested-loop-joins a non-singleton side:\n$plan")
      }
    }
  }

  test("q_range_join hash-joins on the chunk key, not a theta scan") {
    val plan = SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
