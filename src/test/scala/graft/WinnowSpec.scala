package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Pins dd_winnow's contract: the winnowing THEOREM (any shared run of
  * ≥ W+K−1 = 6 tokens yields ≥ 1 shared fingerprint — deterministic
  * recall, the property MinHash banding only has probabilistically),
  * the ~2/(W+1) selection density that makes the index cheaper than the
  * full shingle posting, and the rightmost-min tie rule. The oracle
  * gate covers the pair arithmetic on the real table.
  */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  // docs 1 and 2: unrelated 40-token bodies with the same 6-token run
  // spliced into the middle (6 = W+K−1, the guarantee threshold);
  // doc 3: fully unrelated; doc 4: one token repeated (all gram hashes
  // equal — the tie-break stress case).
  private lazy val tmpDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val run = "shared quick brown fox jumps high"
    def body(seed: Int, n: Int) = (1 to n).map(i => s"w${seed}_$i")
    val docA = (body(1, 20) ++ run.split(" ") ++ body(2, 20)).mkString(" ")
    val docB = (body(3, 20) ++ run.split(" ") ++ body(4, 20)).mkString(" ")
    val docC = body(5, 46).mkString(" ")
    val docD = Seq.fill(12)("rep").mkString(" ")
    Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def fpSets(dir: String): Map[Long, Set[Long]] =
    Dedup.winnowFps(spark, dir)
      .as[(Long, Seq[Long])].collect().map { case (id, fps) => id -> fps.toSet }
      .toMap

  test("winnowing theorem: a 6-token shared run guarantees a shared fingerprint") {
    val fps = fpSets(tmpDir)
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing a W+K-1-token run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "an unrelated doc must not collide (distinct grams, distinct hashes)")
  }

  test("rightmost-min tie rule: a constant doc winnows to one fingerprint") {
    // every gram hash equal -> every window's rightmost-min is the same
    // hash value -> exactly one distinct fingerprint
    assert(fpSets(tmpDir)(4L).size == 1)
  }

  test("selection density tracks 2/(W+1) on the real corpus") {
    val fpCount = Dedup.winnowFps(spark, sfDir)
      .agg(sum(size(col("fps"))).cast("long")).as[Long].head()
    val grams = spark.read.parquet(s"$sfDir/documents.parquet")
      .select((size(graft.functions.TextFunctions.tokens(col("text")))
        - lit(Dedup.WinnowK - 1)).as("m"))
      .filter(col("m") >= 1)
      .agg(sum(col("m")).cast("long")).as[Long].head()
    val density = fpCount.toDouble / grams
    assert(density > 0.25 && density < 0.55,
      s"winnow density $density outside the 2/(W+1)=0.4 band")
  }

  test("deterministic recall over the real table: every dd_substring pair shares a fingerprint") {
    // dd_substring pairs share a verbatim 12-token run >= the 6-token
    // guarantee length, so each must also be a winnow candidate (raw
    // fingerprint intersection, pre-cap)
    val fps = Dedup.winnowFps(spark, sfDir)
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toSet }.toMap
    val pairs = Dedup.ddSubstring(spark, sfDir)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture corpus should contain substring pairs")
    val missed = pairs.filter { case (a, b) => (fps(a) & fps(b)).isEmpty }
    assert(missed.isEmpty,
      s"winnowing guarantee violated for pairs: ${missed.take(5).toSeq}")
  }
}
