package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Differential pin for the knn-graph build's per-cluster native kernel
  * (Kernels.knnTopK) against the r14 join+window form it replaced
  * (Similarity.knnEdgesJoinForm) — row-for-row equality including rank
  * and cos_ppm, plus the kernel's tie/NaN ordering on a hand fixture. */
class KnnKernelSpec extends SparkSpec {
  import spark.implicits._

  test("kernel edge build equals the join form row-for-row on the corpus") {
    val kernel = Similarity.ssKnnGraph(spark, sfDir)
      .select("q_id", "rank", "vec_id", "cos_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    val join = Similarity.knnEdgesJoinForm(spark, sfDir)
      .select("q_id", "rank", "vec_id", "cos_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(kernel.nonEmpty && kernel == join)
  }

  test("kernel ordering: ties break to smaller vec_id, NaN ranks first") {
    import graft.functions.NativeExpressions.knnTopK
    // members: id 1 orthogonal (cos 0), ids 2,3 identical direction
    // (cos 1 tie -> smaller id first), id 4 zero vector (cos NaN ->
    // Spark's desc sort puts NaN first; the kernel must agree), id 5
    // equals the query id (self, excluded).
    val members = Seq(
      (1L, Seq(0.0, 1.0)), (3L, Seq(2.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (4L, Seq(0.0, 0.0)), (5L, Seq(1.0, 1.0)))
    val df = Seq((Seq(1.0, 0.0), 5L))
      .toDF("qv", "q_id")
      .withColumn("members", typedLit(members))
      .select(explode(knnTopK(col("qv"), col("q_id"), col("members"), 3)).as("e"))
      .select(col("e.vec_id")).as[Long].collect().toSeq
    assert(df == Seq(4L, 2L, 3L))
  }
}
