package graft

import org.apache.spark.sql.functions._

import graft.operators.{Balance, Synonyms}

/** The deterministic synonym augmenter behind p05_upsample
  * (5-balance.py:206-212 re-expressed per SURVEY §5). */
class SynonymAugSpec extends SparkSpec {
  import spark.implicits._

  private def augment(text: String, slot: Long): String =
    Seq((text, slot)).toDF("text", "aug_slot")
      .select(expr(Synonyms.sparkAug("text", "aug_slot")).as("t"))
      .as[String].head()

  test("replacement is gated per (token, slot) and spacing is preserved") {
    val src = "Big day today, friends"
    val variants = (0L to 5L).map(augment(src, _))
    // at least two distinct variants across slots, and every variant is a
    // token-for-token substitution (same token count, same delimiters)
    assert(variants.distinct.size >= 2)
    variants.foreach { v =>
      assert(v.split(" ", -1).length == src.split(" ", -1).length)
    }
    // a token carrying punctuation never matches the table
    assert(variants.forall(_.contains("today,")))
  }

  test("same (text, slot) always produces the same variant") {
    val a = augment("a big new idea for the team", 3L)
    val b = augment("a big new idea for the team", 3L)
    assert(a == b)
  }

  test("only table words change; replacements come from the table") {
    val src = "big small happy zorp"
    val syn = Synonyms.pairs.toMap
    (0L to 7L).foreach { s =>
      val out = augment(src, s).split(" ")
      val in = src.split(" ")
      out.zip(in).foreach { case (o, i) =>
        assert(o == i || syn(i) == o, s"slot $s: $i -> $o")
      }
      assert(out.last == "zorp")
    }
  }

  test("native kernel is bit-identical to the HOF form on the real corpus") {
    // p05_upsample runs [[NativeExpressions.synonymAug]]; the DuckDB
    // oracle runs Synonyms.duckAug, whose Spark twin is sparkAug. This
    // differential (real documents × 3 slots, empty/multi-space edge rows
    // appended) is the bridge that keeps kernel and oracle in lockstep.
    val edge = Seq("", " ", "big  small ", " leading big").toDF("text")
    val docs = Tables.documents(spark, sfDir).select(col("text"))
      .limit(500).union(edge)
    val diff = docs
      .crossJoin(Seq(0L, 3L, 11L).toDF("aug_slot"))
      .select(
        graft.functions.NativeExpressions
          .synonymAug(col("text"), col("aug_slot"), Synonyms.pairs).as("k"),
        expr(Synonyms.sparkAug("text", "aug_slot")).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diff == 0L)
  }

  test("kernel matches the HOF form on adversarial generated texts") {
    // Seeded generator (not scalacheck's runtime — one Spark job over all
    // samples beats a job per sample): random mixes of table words,
    // non-table words, unicode, punctuation-attached tokens, and runs of
    // 0-3 spaces including leading/trailing — the byte-walk's edge space.
    val rnd = new scala.util.Random(42)
    val atoms = Vector("big", "BIG", "Small", "zorp", "día", "嗨", "day,",
      "#tag", "", "best", "x", "über", "…", "good.", "HAPPY")
    val texts = Seq.tabulate(400) { _ =>
      (0 to rnd.nextInt(12)).map { _ =>
        (" " * rnd.nextInt(3)) + atoms(rnd.nextInt(atoms.size))
      }.mkString("") + (" " * rnd.nextInt(2))
    }
    val diff = texts.toDF("text")
      .crossJoin(Seq(0L, 7L, 123456789L).toDF("aug_slot"))
      .select(
        graft.functions.NativeExpressions
          .synonymAug(col("text"), col("aug_slot"), Synonyms.pairs).as("k"),
        expr(Synonyms.sparkAug("text", "aug_slot")).as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diff == 0L)
  }

  test("p05_upsample rows carry a transformed aug_text per slot") {
    val df = Balance.p05Upsample(spark, sfDir).cache()
    try {
      assert(df.columns.contains("aug_text"))
      val n = df.count()
      assert(n > 0)
      // every aug_text has the same space-token count as a same-doc sibling
      // (token-for-token substitution), and at least one row actually
      // differs from its source text
      val src = Tables.documents(spark, sfDir).select(col("doc_id"),
        col("text"))
      val joined = df.join(src, "doc_id")
        .select(size(split(col("aug_text"), " ", -1)).as("na"),
          size(split(col("text"), " ", -1)).as("nt"),
          (col("aug_text") =!= col("text")).cast("long").as("changed"))
        .agg(sum(when(col("na") =!= col("nt"), 1L).otherwise(0L)).as("bad"),
          sum(col("changed")).as("changed"))
        .head()
      assert(joined.getLong(0) == 0)
      assert(joined.getLong(1) > 0)
    } finally df.unpersist()
  }
}
