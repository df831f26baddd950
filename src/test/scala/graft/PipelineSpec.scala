package graft

import java.nio.file.Files

/** End-to-end orchestration: the default 17→18→22→23→report chain runs,
  * writes one artifact per stage plus a manifest, and the manifest row
  * counts agree with the written parquet. */
class PipelineSpec extends SparkSpec {

  test("default pipeline run writes all stage artifacts and a manifest") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val manifest = Pipeline.run(spark, sfDir, out, "t1").collect()

    assert(manifest.map(_.getAs[String]("stage")).toSeq == Pipeline.defaultStages)
    manifest.foreach { r =>
      val rows = r.getAs[Long]("rows")
      val path = r.getAs[String]("path")
      assert(rows > 0, s"stage ${r.getAs[String]("stage")} wrote no rows")
      assert(spark.read.parquet(path).count() == rows)
    }
    // rw_report aggregates over 18 reward columns.
    assert(manifest.last.getAs[Long]("rows") == 18)
    // Manifest persisted alongside the artifacts.
    assert(spark.read.json(s"$out/t1/_manifest").count() == Pipeline.defaultStages.size)
  }

  test("unknown stage name fails loudly") {
    val out = Files.createTempDirectory("graft_pipeline_bad").toString
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, sfDir, out, "t2", Seq("p17_style", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
