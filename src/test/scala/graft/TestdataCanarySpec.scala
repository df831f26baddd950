package graft

import org.apache.spark.sql.types._

/** Canary for driver-regenerated testdata: the driver has rewritten
  * /root/testdata mid-stream twice (events.ts nanos-as-long → micros),
  * each time breaking consumers in scattered, hard-to-diagnose ways.
  * This ONE spec reads every table through Tables and pins the
  * normalized dtypes every operator depends on — if the data changes
  * shape again, this is the test that names the problem.
  */
class TestdataCanarySpec extends SparkSpec {

  private def dtypes(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, sfDir)
      case n        => Tables.read(spark, sfDir, n)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  test("all ten tables exist and are non-empty at sf0.001") {
    for (t <- Tables.all) {
      val df = if (t == "events") Tables.events(spark, sfDir) else Tables.read(spark, sfDir, t)
      assert(df.limit(1).count() == 1L, s"table $t is empty or unreadable")
    }
  }

  test("events.ts normalizes to TimestampType whatever the parquet encoding") {
    val e = dtypes("events")
    assert(e("ts") == TimestampType,
      s"events.ts read as ${e("ts")} — Tables.events must normalize nanos-long / NTZ / utc to TimestampType")
    assert(e("event_id") == LongType && e("user_id") == LongType)
    assert(e("event_type") == StringType && e("props") == StringType)
    assert(e("value") == DoubleType)
  }

  test("fact/dim key and measure dtypes are what the operators assume") {
    val li = dtypes("lineitem")
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType && li("l_suppkey") == LongType)
    assert(li("l_quantity") == DoubleType && li("l_extendedprice") == DoubleType &&
      li("l_discount") == DoubleType && li("l_tax") == DoubleType)
    assert(li("l_returnflag") == StringType && li("l_linestatus") == StringType)
    assert(Seq(TimestampType, TimestampNTZType, DateType).contains(li("l_shipdate")),
      s"l_shipdate read as ${li("l_shipdate")}")

    val o = dtypes("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_totalprice") == DoubleType)
    assert(Seq(TimestampType, TimestampNTZType, DateType).contains(o("o_orderdate")),
      s"o_orderdate read as ${o("o_orderdate")}")

    val c = dtypes("customer")
    assert(c("c_custkey") == LongType && c("c_nationkey") == IntegerType &&
      c("c_acctbal") == DoubleType && c("c_mktsegment") == StringType)
    val n = dtypes("nation")
    assert(n("n_nationkey") == IntegerType && n("n_regionkey") == IntegerType)
    val r = dtypes("region")
    assert(r("r_regionkey") == IntegerType && r("r_name") == StringType)
    val s = dtypes("supplier")
    assert(s("s_suppkey") == LongType && s("s_nationkey") == IntegerType)
    val p = dtypes("part")
    assert(p("p_partkey") == LongType && p("p_size") == IntegerType &&
      p("p_retailprice") == DoubleType)
  }

  test("documents and embeddings match the text/ANN operators' expectations") {
    val d = dtypes("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType && d("n_chars") == LongType)

    val e = dtypes("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType)
    e("embedding") match {
      case ArrayType(el, _) =>
        assert(el == FloatType || el == DoubleType, s"embedding element read as $el")
      case other => fail(s"embedding read as $other — expected array<float|double>")
    }
  }
}
