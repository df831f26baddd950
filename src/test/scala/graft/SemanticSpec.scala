package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Pins dd_semantic's SemDeDup semantics on a constructed corpus: the
  * k-means clusters ARE the blocking structure, so (a) a within-cluster
  * cosine dup drops the larger id and (b) a cross-cluster pair is
  * invisible EVEN AT cosine 1.0 — the deliberate recall trade that
  * bounds pair fan-in by Σ|cluster|². The miss case here is the
  * L2/cosine mismatch itself: vectors along the same direction at
  * different magnitudes are cosine-identical but L2-far, land in
  * different clusters, and never pair — while dd_embedding's
  * direction-bucketed blocker still catches them.
  */
class SemanticSpec extends SparkSpec {

  import spark.implicits._

  // Four vectors along e1: ids 0, 1 at magnitude ~10 (cluster seeded by
  // vec 0), ids 2, 50 at magnitude ~1 (cluster seeded by vec 50). Every
  // pairwise cosine is 1.0; only same-cluster pairs may be flagged.
  private lazy val tmpDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("semantic").toString
    def vec(mag: Float): Array[Float] = Array.tabulate(64)(j => if (j == 0) mag else 0f)
    Seq(
      (0L, vec(10f), 0),
      (1L, vec(10.001f), 0),
      (2L, vec(1.0001f), 1),
      (50L, vec(1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val verdicts: Map[Long, (Long, Long, Long)] =
    Similarity.ddSemantic(spark, tmpDir)
      .select(col("vec_id"), col("cluster"), col("n_dups"), col("is_kept"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, c, n, k) => id -> ((c, n, k)) }.toMap

  test("within-cluster cosine dup: larger id dropped, min id kept") {
    assert(verdicts(0L) == ((0L, 1L, 1L)), s"got ${verdicts(0L)}")
    assert(verdicts(1L) == ((0L, 1L, 0L)), s"got ${verdicts(1L)}")
    assert(verdicts(2L) == ((50L, 1L, 1L)), s"got ${verdicts(2L)}")
    assert(verdicts(50L) == ((50L, 1L, 0L)), s"got ${verdicts(50L)}")
  }

  test("cross-cluster pairs stay invisible at cosine 1.0 (the blocking trade)") {
    // cos(v0, v50) = 1.0 exactly, yet n_dups(0) counts only the
    // same-cluster neighbor — the cross-cluster dup never pairs
    assert(verdicts(0L)._2 == 1L && verdicts(2L)._2 == 1L)
  }

  test("dd_embedding's direction-bucketed blocker catches the pair dd_semantic trades away") {
    val embPairs = Dedup.ddEmbedding(spark, tmpDir)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(embPairs.contains((0L, 50L)),
      s"sign-bucket blocking must see the magnitude-split pair, got $embPairs")
  }
}
