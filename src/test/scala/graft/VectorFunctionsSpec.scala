package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def calc(a: Seq[Float], b: Seq[Float],
                   f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("r"))
      .collect()(0).getDouble(0)

  test("dot / cosine / l2 on known vectors") {
    assert(calc(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), dot) == 32.0)
    assert(math.abs(calc(Seq(1f, 0f), Seq(0f, 1f), cosine)) < 1e-12)
    assert(math.abs(calc(Seq(2f, 0f), Seq(5f, 0f), cosine) - 1.0) < 1e-12)
    assert(calc(Seq(1f, 1f), Seq(4f, 5f), l2Sq) == 25.0)
    assert(calc(Seq(0f, 3f), Seq(4f, 0f), l2Distance) == 5.0)
  }

  test("cosine of antiparallel vectors is -1") {
    assert(math.abs(calc(Seq(1f, 2f), Seq(-1f, -2f), cosine) + 1.0) < 1e-12)
  }

  test("native kernels reject mismatched vector dimensions at runtime") {
    val e = intercept[Exception] {
      calc(Seq(1f, 2f, 3f), Seq(1f, 2f), graft.functions.NativeExpressions.cosineSim)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dimension mismatch")))
  }

  test("signLshBucket sets bit p iff dot(v, plane_p) > 0") {
    import graft.functions.NativeExpressions.signLshBucket
    // plane 0 = [+1, -1], plane 1 = [+1, +1]
    val planes = Seq(Seq(1.0, -1.0), Seq(1.0, 1.0))
    def bucket(v: Seq[Double]): Long =
      Seq(Tuple1(v)).toDF("v")
        .select(signLshBucket(col("v"), planes).as("b")).as[Long].head()
    assert(bucket(Seq(3.0, 1.0)) == 3L)  // dot0=2>0, dot1=4>0
    assert(bucket(Seq(1.0, 3.0)) == 2L)  // dot0=-2, dot1=4>0
    assert(bucket(Seq(-1.0, -3.0)) == 1L) // dot0=2>0, dot1=-4
    assert(bucket(Seq(1.0, 1.0)) == 2L)  // dot0=0 NOT > 0
  }

  test("native vector expressions reject non-float arrays at analysis time") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.NativeExpressions.cosineSim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toUpperCase.contains("DATATYPE_MISMATCH") ||
      e.getMessage.contains("requires"))
  }
}
