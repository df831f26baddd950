package graft

/** Session-level tuning shared by the Bench / Verify / Rehearsal mains.
  */
object SessionTuning {

  /** Heap-aware `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`.
    *
    * The suite raises the 128-key default because every object
    * aggregate here has bounded per-key state (see the rationale at the
    * call sites) — but the raise itself must be a MEMORY BUDGET, not a
    * constant: at 100× stress the fixed 1M-key setting × 32 concurrent
    * partial maps exceeded an 8 GB driver before sort-fallback could
    * trigger (q_market_basket, STRESS100_r09_run1_8g.json), while a
    * 32 GB driver ran the same row fine. Budget an eighth of each
    * task's heap share at ~96 bytes per hash-map entry, capped at the
    * old 1M (beyond which the win is noise) and floored well above the
    * sort-happy 128 default.
    *
    * `executorMemory` (a `spark.executor.memory` size string, e.g.
    * "8g") sizes the budget when given; the `Runtime.maxMemory`
    * fallback reads the CALLING JVM's heap, which equals the executor
    * heap only in local mode. The mains wire it from the
    * SPARK_EXECUTOR_MEMORY environment variable (the same value a
    * cluster submit passes as `spark.executor.memory`), so a deployment
    * whose executor heap differs from the driver's budgets correctly —
    * local runs leave it unset and use the JVM heap.
    */
  def objectAggFallbackThreshold(cores: Int,
      executorMemory: Option[String] = None): Long = {
    val heap = executorMemory
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(Runtime.getRuntime.maxMemory)
    val heapPerTask = heap / math.max(cores, 1)
    math.max(131072L, math.min(1000000L, heapPerTask / 8 / 96))
  }
}
