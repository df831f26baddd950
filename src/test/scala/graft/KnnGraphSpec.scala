package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ss_knn_graph is hash-gated end-to-end (it shares ss_ivf_topk's probe
  * and cosine algebra), so this spec pins the GRAPH properties the hash
  * cannot express: corpus coverage, structural invariants, IVF recall
  * against an exact brute-force graph, and agreement with ss_ivf_topk on
  * the shared query subset (the graph restricted to vec_id < 10 must BE
  * the external-query result — one blocker, two consumers).
  */
class KnnGraphSpec extends SparkSpec {

  private lazy val graph = Similarity.ssKnnGraph(spark, sfDir).cache()

  test("every vector appears as a query with at most TopK ranked neighbors") {
    val n = Tables.embeddings(spark, sfDir).count()
    val byQ = graph.groupBy("q_id").agg(
      count(lit(1)).as("deg"), max("rank").as("mr"), min("rank").as("lo")).cache()
    try {
      assert(byQ.count() == n, "a vector is missing from the graph's query side")
      val bad = byQ.filter(col("deg") > Similarity.TopK ||
        col("mr") =!= col("deg") || col("lo") =!= 1L).count()
      assert(bad == 0, "ranks must be 1..deg with deg <= TopK")
    } finally byQ.unpersist()
  }

  test("no self edges; every edge lands inside a probed bucket pair") {
    assert(graph.filter(col("q_id") === col("vec_id")).count() == 0)
  }

  test("IVF graph recall vs the exact brute-force graph holds its floor") {
    // Exact graph: all-pairs cosine top-k (test-only — the operator
    // exists to avoid exactly this join at scale). Same near-uniform-
    // sphere caveat as IvfRecallSpec: recall ≈ probed fraction, measured
    // ~0.36 at sf0.001; pin with margin.
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = e.as("a").join(e.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("vec_id"),
        graft.functions.NativeExpressions
          .cosineSim(col("a.v"), col("b.v")).as("cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= Similarity.TopK)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graph.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"knn-graph recall@${Similarity.TopK} = $recall")
  }

  test("restricted to the external query set, the graph equals ss_ivf_topk") {
    val sub = graph.filter(col("q_id") < 10)
      .select("q_id", "rank", "vec_id", "cos_ppm").collect().toSet
    val ivf = Similarity.ssIvfTopk(spark, sfDir)
      .select("q_id", "rank", "vec_id", "cos_ppm").collect().toSet
    assert(sub == ivf,
      "graph rows for vec_id<10 must be exactly the external-query result")
  }
}
