package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Pins dd_containment's reason to exist: a short doc quoted whole
  * inside a much longer one is invisible to the symmetric dedup family
  * (Jaccard below threshold, MinHash bands collide with Jaccard
  * probability) but is a full-containment pair here. The synthetic
  * corpus has no such pairs (its dups are same-length near-copies), so
  * this spec builds the doc-in-doc case itself; the oracle gate covers
  * the arithmetic on the real table.
  */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  // doc 1: 30 distinct tokens; doc 2: doc 1 verbatim + a 70-token tail.
  // Containment of 1 in 2 = 1.0; Jaccard ≈ 28/98 ≈ 0.29 — over the
  // near-dup threshold's reach but far under containment's 0.8.
  private lazy val tmpDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("containment").toString
    val short = (1 to 30).map(i => s"tok$i").mkString(" ")
    val tail = (100 to 169).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, short),
      (2L, s"$short $tail"),
      (3L, (200 to 260).map(i => s"tok$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("doc-in-doc pair: full containment, sub-threshold Jaccard") {
    val got = Dedup.ddContainment(spark, tmpDir)
      .select(col("contained_id"), col("container_id"), col("cont_ppm"), col("j_ppm"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.length == 1, s"expected exactly the (1 in 2) pair, got $got")
    val (contained, container, cont, jac) = got.head
    assert(contained == 1L && container == 2L)
    assert(cont == 1000000L, s"verbatim inclusion must read containment 1.0, got $cont")
    assert(jac < Dedup.ContainmentThresholdPpm,
      s"the pair must be invisible at a symmetric 0.8 threshold, got j=$jac")
  }

  test("the symmetric operator misses the same pair at the containment threshold") {
    // dd_ngram_jaccard emits it only because its threshold is 0.2; at
    // containment's 0.8 bar the symmetric score fails — the asymmetry is
    // what the new operator adds, not a lower bar
    val j = Dedup.ddNgramJaccard(spark, tmpDir)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select(col("j_ppm")).as[Long].collect()
    assert(j.forall(_ < Dedup.ContainmentThresholdPpm))
  }

  test("equal-size exact dups tie-break contained to the smaller id") {
    val dir = java.nio.file.Files.createTempDirectory("containment2").toString
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq((7L, text), (3L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.ddContainment(spark, dir)
      .select(col("contained_id"), col("container_id")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 7L)))
  }
}
