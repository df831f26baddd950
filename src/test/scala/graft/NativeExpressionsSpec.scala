package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions._
import graft.functions.TextFunctions._

/** The native expressions must be value-identical to the Column/HOF
  * compositions they replace (which the DuckDB oracle mirrors). */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "   ", "one", "a b", "a b c", "a b c d e f g",
    "dup dup dup words words here", "tab\tand\nnewline  split",
    "x " * 200 + "tail y z")

  test("wordShingles == HOF shingles on edge cases and real docs") {
    val docs = samples.toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val diff = docs.select(
      shingles(col("text"), 3).as("hof"),
      wordShingles(col("text"), 3).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("dominantToken == naive count-per-distinct argmin") {
    val docs = samples.toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val ts = tokens(col("text"))
    val keyed = transform(array_distinct(ts), x =>
      concat(lpad((lit(1000000000) - size(filter(ts, tk => tk === x))).cast("string"), 10, "0"), x))
    val naive = substring(array_min(keyed), 11, 1000000)
    val diff = docs.select(naive.as("hof"), dominantToken(col("text")).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("argminL2 == array_min over the HOF distance fold") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val centArr = e.filter(col("vec_id") % 50 === 0)
      .agg(collect_list(struct(col("vec_id").as("c_id"), col("v").as("cv"))).as("cents"))
    val both = e.crossJoin(centArr)
      .select(
        array_min(transform(col("cents"), c =>
          struct(graft.functions.NativeExpressions.l2SqDist(col("v"), c.getField("cv")).as("d"),
            c.getField("c_id").as("c_id")))).as("hof"),
        graft.functions.NativeExpressions.argminL2(col("v"), col("cents")).as("native"))
    assert(both.filter(not(col("hof") <=> col("native"))).count() == 0)
  }

  test("argminL2 skips NaN distances like array_min's NaN-sorts-greatest") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(
        (1L, Seq(Double.NaN, 0.0)),   // NaN distance in the FIRST slot
        (2L, Seq(0.5, 0.0)),          // finite minimum (d = 0.25)
        (3L, Seq(9.0, 0.0)))),
      (Seq(1.0, 0.0), Seq(
        (4L, Seq(Double.NaN, 0.0)),   // all-NaN -> HOF struct ordering
        (2L, Seq(Double.NaN, 0.0))))  // ties on NaN, takes the min id
    ).toDF("v", "cents")
    val out = df.select(
      graft.functions.NativeExpressions.argminL2(col("v"), col("cents")).as("m"))
      .select(col("m").getField("c_id")).as[Option[Long]].collect().toSeq
    // All-NaN yields (NaN, min id), not null — a vector with a degenerate
    // distance still lands in SOME cluster instead of vanishing at the
    // cluster-id equi-join downstream (matches array_min: NaN == NaN in
    // the struct ordering, so the id breaks the tie).
    assert(out == Seq(Some(2L), Some(2L)))
  }

  test("argmin2L2 == first two of the sorted HOF distance array") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val centArr = e.filter(col("vec_id") % 50 === 0)
      .agg(collect_list(struct(col("vec_id").as("c_id"), col("v").as("cv"))).as("cents"))
    val sorted = array_sort(transform(col("cents"), c =>
      struct(graft.functions.NativeExpressions.l2SqDist(col("v"), c.getField("cv")).as("d"),
        c.getField("c_id").as("c_id"))))
    val both = e.crossJoin(centArr)
      .withColumn("sorted", sorted)
      .select(
        struct(
          col("sorted").getItem(0).getField("d").as("d"),
          col("sorted").getItem(0).getField("c_id").as("c_id"),
          coalesce(try_element_at(col("sorted"), lit(2)).getField("d"),
            col("sorted").getItem(0).getField("d")).as("d2")).as("hof"),
        graft.functions.NativeExpressions.argmin2L2(col("v"), col("cents")).as("native"))
    assert(both.filter(not(col("hof") <=> col("native"))).count() == 0)
  }

  test("argmin2L2 single-centroid and NaN tails match the sort order") {
    val out = Seq(
      // single centroid: d2 falls back to d (silhouette-0 contract)
      (Seq(1.0, 0.0), Seq((7L, Seq(0.0, 0.0)))),
      // NaN second: one finite, one NaN -> (finite, id, NaN)
      (Seq(1.0, 0.0), Seq((1L, Seq(Double.NaN, 0.0)), (2L, Seq(0.5, 0.0)))),
      // tie on d: ids break it, second carries the same d
      (Seq(0.0, 0.0), Seq((5L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))))
      .toDF("v", "cents")
      .select(graft.functions.NativeExpressions.argmin2L2(col("v"), col("cents")).as("m"))
      .select(col("m.c_id"), col("m.d"), col("m.d2"))
      .as[(Long, Double, Double)].collect().toSeq
    assert(out(0) == ((7L, 1.0, 1.0)))
    assert(out(1)._1 == 2L && out(1)._2 == 0.25 && out(1)._3.isNaN)
    assert(out(2) == ((3L, 1.0, 1.0)))
  }

  test("minHashSigs == HOF minhash chain") {
    val k = 16
    val p = 4294967291L
    val docs = samples.toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
      .select(shingles(col("text"), 3).as("sh"))
    val hs = transform(col("sh"), s => md5(s))
    val av = transform(hs, h => hexLong(h, 8))
    val bv = transform(hs, h => hexLong(substring(h, 9, 8), 8))
    val hof = array((0 until k).map { i =>
      array_min(zip_with(av, bv, (a, b) => (a + lit(i.toLong) * b) % lit(p)))
    }: _*)
    val diff = docs.select(hof.as("hof"), minHashSigs(col("sh"), k, p).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("sigMatches == aggregate(zip_with(eq)) fold over signature pairs") {
    val k = 16
    val p = 4294967291L
    val docs = samples.toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
      .select(minHashSigs(shingles(col("text"), 3), k, p).as("s"))
    // every (row, reversed-neighbor) pairing via a self-crossJoin sample
    val a = docs.limit(40).withColumn("i", monotonically_increasing_id())
    val pairs = a.select(col("s").as("sa"), col("i"))
      .join(a.select(reverse(col("s")).as("sb"), col("i")), "i")
      .select(col("sa"), col("sb"))
      .union(a.select(col("s").as("sa"), col("s").as("sb")))
    val hof = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val diff = pairs
      .select(hof.as("hof"), sigMatches(col("sa"), col("sb")).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("bpeCount == regexp_count of the subword alternation") {
    val docs = (samples ++ Seq("🙂ab🙂", "abcdefgh 12345 x!?", "好的 test"))
      .toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val hof = regexp_count(col("text"), lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"))
    val diff = docs.select(hof.as("h"),
      graft.functions.NativeExpressions.bpeCount(col("text")).as("k"))
      .filter(col("h") =!= col("k"))
      .count()
    assert(diff == 0)
  }

  test("sentenceCount and fingerprint == their Column-chain forms") {
    val docs = (samples ++ Seq("Ünïcode ÅÄÖ mixed. CASE Text!", "a.b!c?d"))
      .toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val hofSent = size(filter(split(col("text"), "[.!?]+"), s => length(trim(s)) > lit(0)))
    val hofFp = md5(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""), "\\s+", " "))
    val diff = docs.select(
      hofSent.as("hs"),
      graft.functions.NativeExpressions.sentenceCount(col("text")).as("ks"),
      hofFp.as("hf"),
      graft.functions.NativeExpressions.fingerprint(col("text")).as("kf"))
      .filter(col("hs") =!= col("ks") || col("hf") =!= col("kf"))
      .count()
    assert(diff == 0)
  }

  test("sq8Dot == HOF quantize-then-dot fold") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(greatest(lit(-1.0), least(lit(1.0), x)) * 127 + 0.5).cast("long"))
    val pairs = e.crossJoin(q)
    val hof = aggregate(zip_with(quant(col("qv")), quant(col("v")), _ * _),
      lit(0L), _ + _)
    val diff = pairs.select(hof.as("hof"),
      graft.functions.NativeExpressions.sq8Dot(col("qv"), col("v")).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
    // out-of-range + negative-half + NaN coordinates: clip to ±127,
    // floor(v+0.5) half-UP rounding (math.round/DuckDB round() both
    // disagree on -0.5), NaN clips HIGH to 127 (Spark least/greatest and
    // DuckDB LEAST/GREATEST both order NaN greatest — math.min/max would
    // propagate it to code 0 and diverge the engines)
    val edge = Seq((Seq(2.0, -2.0, 0.0039370078740157480d, -0.0039370078740157480d, Double.NaN),
      Seq(1.0, 1.0, 1.0, 1.0, 1.0))).toDF("a", "b")
    val got = edge.select(
      graft.functions.NativeExpressions.sq8Dot(col("a"), col("b"))).as[Long].head()
    // b quantizes to 127 per slot; a: clip(2)=127, clip(-2)=-127,
    // ±(0.5/127) → floor(±0.5 + 0.5) = 1 and 0 (half-UP, not half-away),
    // NaN → 127 ⇒ 127·127 − 127·127 + 1·127 + 0·127 + 127·127 = 16256
    assert(got == 16256L)
    // and the HOF least/greatest chain agrees on the NaN row
    val hofEdge = edge.select(aggregate(
      zip_with(quant(col("a")), quant(col("b")), _ * _), lit(0L), _ + _)).as[Long].head()
    assert(hofEdge == 16256L)
  }

  test("wordNgrams == HOF zip_with bigram chain on edge cases and real docs") {
    val docs = (samples ++ Seq("a", "a b", "a  b   c"))
      .toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val ts = tokens(col("text"))
    val hof = when(size(ts) >= 2, zip_with(
      slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
      (a, b) => concat(a, lit(" "), b))).otherwise(array())
    val diff = docs.select(hof.as("hof"),
      graft.functions.NativeExpressions.wordNgrams(col("text"), 2).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("ngramRepetition == relational explode+groupBy stats") {
    val docs = (samples ++ Seq("a a a a", "x y x y x"))
      .toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
      .withColumn("id", monotonically_increasing_id())
    val toks = docs.select(col("id"), tokens(col("text")).as("toks"))
    val rel = toks.filter(size(col("toks")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .groupBy("id", "g").count()
      .groupBy("id").agg(
        sum("count").as("total"), max("count").as("top"),
        sum(when(col("count") >= 2, col("count")).otherwise(0L)).as("dup"))
    val native = docs.select(col("id"),
      graft.functions.NativeExpressions.ngramRepetition(col("text"), 2).as("r"))
      .filter(col("r.total") > 0)
      .select(col("id"), col("r.total").as("total"), col("r.top").as("top"),
        col("r.dup").as("dup"))
    assert(native.exceptAll(rel).count() == 0 && rel.exceptAll(native).count() == 0)
  }

  test("simHash32 == HOF simhash chain") {
    val docs = samples.toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val hv = transform(tokens(col("text")), t => hexLong(md5(t), 8))
    val n = size(hv).cast("long")
    val hof = (0 until 32).map { j =>
      val cnt = size(filter(hv,
        v => shiftrightunsigned(v, j).bitwiseAND(lit(1L)) === lit(1L))).cast("long")
      when(cnt * 2 >= n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val diff = docs.select(hof.as("hof"), simHash32(col("text")).as("native"))
      .filter(not(col("hof") <=> col("native")))
      .count()
    assert(diff == 0)
  }

  test("topNCentroidIds == sorted-slice HOF chain, including tie and NaN order") {
    import graft.functions.NativeExpressions.{l2SqDist, topNCentroidIds}
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    // real centroid array (every 50th vector) + crafted centroids forcing
    // an exact distance tie (duplicate vector, higher id) and a NaN
    // distance (NaN component) — the orders array_sort defines
    val crafted = e.limit(1).select(
      array(
        struct(lit(900L).as("c_id"), col("v").as("cv")),
        struct(lit(901L).as("c_id"), col("v").as("cv")), // tie with 900
        struct(lit(902L).as("c_id"),
          transform(col("v"), _ => lit(Float.NaN)).as("cv")) // NaN distance
      ).as("cents"))
    val centArr = e.filter(col("vec_id") % 50 === 0)
      .agg(collect_list(struct(col("vec_id").as("c_id"), col("v").as("cv"))).as("cents"))
    for ((arr, n) <- Seq((centArr, 2), (centArr, 5), (crafted, 3))) {
      val q = e.limit(40).crossJoin(broadcast(arr))
      val hof = q.select(col("vec_id"),
        transform(slice(array_sort(transform(col("cents"),
          c => struct(l2SqDist(col("v"), c.getField("cv")).as("d"),
            c.getField("c_id").as("c_id")))), 1, n),
          p => p.getField("c_id")).as("ids"))
      val native = q.select(col("vec_id"),
        topNCentroidIds(col("v"), col("cents"), n).as("ids"))
      val diff = native.exceptAll(hof).count() + hof.exceptAll(native).count()
      assert(diff == 0, s"n=$n mismatch")
    }
  }
}
