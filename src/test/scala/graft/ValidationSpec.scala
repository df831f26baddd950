package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Validation
import graft.sources.PostsJsonl

/** src_validate — the ingestion contract (utils/validation.py:1-100).
  * Pins the documents-table bitmask semantics (each injected damage class
  * maps to exactly its bit) and drives the JSONL post-frame contract
  * through PostsJsonl's corrupt-line surface.
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("documents contract: each damage class maps to its bit") {
    val rows = Validation.srcValidate(spark, sfDir)
      .select("doc_id", "violations", "n_viol", "keep", "first_reason")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.length == 500)
    rows.foreach { case (id, v, n, keep, reason) =>
      val expReq = id % 13 == 0 || id % 23 == 0 || id % 29 == 0
      val expEnum = id % 17 == 0
      // nulled text suppresses the consistency check (nothing to
      // compare); emptied text trips it too (n_chars kept its original
      // value, text is now 0 chars)
      val expRange = id % 13 != 0 && (id % 19 == 0 || id % 29 == 0)
      val exp = (if (expReq) 1L else 0L) + (if (expEnum) 2L else 0L) +
        (if (expRange) 4L else 0L)
      assert(v == exp, s"doc $id: violations $v != $exp")
      assert(n == java.lang.Long.bitCount(v), s"doc $id: n_viol")
      assert((keep == 1L) == (v == 0L), s"doc $id: keep")
      val expReason = if (expReq) "missing_required"
        else if (expEnum) "bad_enum" else if (expRange) "bad_range" else ""
      assert(reason == expReason, s"doc $id: reason")
    }
    // the injector must produce live rows for every class
    assert(rows.count(_._2 != 0L) > 50)
    assert(Set(1L, 2L, 4L).subsetOf(rows.map(_._2).toSet))
  }

  test("JSONL post contract: corrupt lines, missing text, bad ranges") {
    val dir = Files.createTempDirectory("val").toString
    val f = s"$dir/posts.jsonl"
    Files.write(Paths.get(f), Seq(
      """{"post_text": "good", "follower_count": 100, "total_likes_count": 5, "comments_count": 2, "shares_count": 1}""",
      """{"post_text": "negative likes", "follower_count": 10, "total_likes_count": -3, "comments_count": 0, "shares_count": 0}""",
      """{"follower_count": 50, "total_likes_count": 1, "comments_count": 0, "shares_count": 0}""",
      """{"post_text": "way too popular", "follower_count": 2000000000, "total_likes_count": 0, "comments_count": 0, "shares_count": 0}""",
      """this line is not json""").mkString("\n").getBytes("UTF-8"))
    val out = Validation.validatePosts(PostsJsonl.read(spark, f))
      .select(col("post_text"), col("violations"), col("keep"))
      .as[(Option[String], Long, Long)].collect()
    val byText = out.map(r => r._1.getOrElse("<null>") -> r).toMap
    assert(byText("good")._2 == 0L && byText("good")._3 == 1L)
    assert(byText("negative likes")._2 == 4L)
    assert(byText("way too popular")._2 == 8L)
    // missing post_text on a parseable line → bit 2
    assert(byText.contains("<null>"))
    val nulls = out.filter(_._1.isEmpty)
    assert(nulls.exists(_._2 == 2L)) // parseable, text missing
    assert(nulls.exists(r => (r._2 & 1L) == 1L)) // corrupt line
    assert(out.forall(r => (r._3 == 1L) == (r._2 == 0L)))
  }
}
