package graft

import org.apache.spark.sql.functions._

import graft.operators.Annotate

/** Pins the annotation seam's contract with a deterministic stub standing
  * in for the model call: batch bounds, 1:1 id-aligned output, and
  * equivalence with the same logic expressed as a column — so the seam
  * provably adds plumbing, not semantics. */
class AnnotateSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("annotateBatches: stub annotator matches the column equivalent") {
    // deterministic stub "model": length bucket per text
    val out = Annotate.annotateBatches(docs, batchSize = 7) { b =>
      b.texts.toSeq.map(t => if (t.length < 200) "short" else "long")
    }
    val expected = docs.select(col("doc_id").cast("long"),
      when(length(col("text")) < 200, "short").otherwise("long").as("annotation"))
    assert(out.count() == docs.count())
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
  }

  test("annotateBatches: every batch is bounded and non-empty") {
    val sizes = spark.sparkContext.collectionAccumulator[java.lang.Integer]("sizes")
    Annotate.annotateBatches(docs.repartition(3), batchSize = 32) { b =>
      sizes.add(b.size)
      b.texts.toSeq.map(_ => "x")
    }.write.format("noop").mode("overwrite").save()
    val observed = sizes.value
    assert(!observed.isEmpty)
    observed.forEach { s =>
      assert(s > 0 && s <= 32, s"batch size $s out of (0, 32]")
    }
  }

  test("annotateBatches: size-mismatched annotator output fails loudly") {
    val bad = Annotate.annotateBatches(docs) { b => Seq("only-one") }
    val e = intercept[Exception] {
      bad.write.format("noop").mode("overwrite").save()
    }
    assert(e.getMessage != null)
  }

  test("annotateBatches: non-positive batchSize is rejected at the call site") {
    intercept[IllegalArgumentException] {
      Annotate.annotateBatches(docs, batchSize = 0)(b => b.texts.toSeq)
    }
  }

  test("annotateGroups: id-dropping annotator output fails loudly") {
    val bad = Annotate.annotateGroups(docs, "lang") { (_, rows) =>
      rows.drop(1).map { case (id, _) => (id, "x") } // loses one doc
    }
    val e = intercept[Exception] {
      bad.write.format("noop").mode("overwrite").save()
    }
    assert(e.getMessage != null)
  }

  test("annotateGroups: whole-group context reaches the function") {
    // stub per-group annotation: each doc labeled with its group's size —
    // verifiable against a plain groupBy count
    val out = Annotate.annotateGroups(docs, "lang") { (_, rows) =>
      rows.map { case (id, _) => (id, rows.size.toString) }
    }
    val expected = docs
      .withColumn("annotation",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))).cast("string"))
      .select(col("doc_id").cast("long"), col("annotation"))
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
  }
}
