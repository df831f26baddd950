package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions.rewardStats
import graft.functions.TextFunctions._

/** The one-pass RewardStats kernel must be value-identical to the
  * Column/HOF formulations it replaced (which the DuckDB oracle mirrors). */
class RewardStatsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "   ", "one", "a b. c d! e f? g",
    "Good good. bad sad. great win best!",
    "para one here\n\npara two here\n\npara one here",
    "- bullet a\n- bullet b\n---\nplain",
    "1. first\n2. second\n~~~~\n=== x",
    "• dot bullet only",
    "Hello 🙂 world 🙂 🚀!",
    "sent one two three four. sent five six seven eight. nine ten.",
    "  spaced sentence  .  another one  !   ",
    "tab\tsplit\nnewline mix. second sentence here? third one now.")

  /** Seeded fuzz corpus: random concatenations of the pieces that drive
    * every kernel branch (sentence/paragraph breaks, bullets, dividers,
    * lexicon words, emoji, CJK, tabs, hashtags). */
  private val fuzz: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val pieces = Array(
      "good", "bad", "Foo", "bar9", "好的", "x", "#tag", "•", "- ", "1. ",
      "---", "===", "~~~", ".", ",", "!", "?", ";", " ", "  ", "\t",
      "\n", "\n\n", "🙂", "🚀", "win", "loss", "the")
    (0 until 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
    }
  }

  private def docs =
    (samples ++ fuzz).toDF("text")
      .union(spark.read.parquet(s"$sfDir/documents.parquet").select("text"))

  private val t = col("text")

  test("vocab fields == HOF alpha-word counts") {
    val words = transform(filter(tokens(t), w => w.rlike("^[A-Za-z]+$")), w => lower(w))
    val diff = docs.select(
      size(words).as("hof_total"),
      size(array_distinct(words)).as("hof_distinct"),
      rewardStats(t).getField("awords_total").as("k_total"),
      rewardStats(t).getField("awords_distinct").as("k_distinct"))
      .filter(col("hof_total") =!= col("k_total") ||
        col("hof_distinct") =!= col("k_distinct"))
      .count()
    assert(diff == 0)
  }

  test("sentence moments == HOF sentence token-length sums") {
    val sents = filter(split(t, "[.!?]+"), s => length(trim(s)) > lit(0))
    val lens = transform(sents, s =>
      size(filter(split(s, "\\s+"), x => length(x) > lit(0))).cast("long"))
    val diff = docs.select(
      size(lens).as("hof_n"),
      aggregate(lens, lit(0L), (acc, v) => acc + v).as("hof_sum"),
      aggregate(lens, lit(0L), (acc, v) => acc + v * v).as("hof_sumsq"),
      rewardStats(t).getField("sent_n").cast("int").as("k_n"),
      rewardStats(t).getField("sent_sum").as("k_sum"),
      rewardStats(t).getField("sent_sumsq").as("k_sumsq"))
      .filter(col("hof_n") =!= col("k_n") || col("hof_sum") =!= col("k_sum") ||
        col("hof_sumsq") =!= col("k_sumsq"))
      .count()
    assert(diff == 0)
  }

  test("sim_avg_ppm == HOF adjacent-paragraph Jaccard average") {
    val paras = filter(split(t, "\n\n"), p => length(trim(p)) > 0)
    val np = size(paras)
    val sims = zip_with(
      slice(paras, lit(1), greatest(np - 1, lit(0))),
      slice(paras, lit(2), greatest(np - 1, lit(0))),
      (a, b) => {
        val ta = array_distinct(filter(split(a, "\\s+"), x => length(x) > lit(0)))
        val tb = array_distinct(filter(split(b, "\\s+"), x => length(x) > lit(0)))
        val inter = size(array_intersect(ta, tb)).cast("long")
        val uni = size(ta).cast("long") + size(tb).cast("long") - inter
        when(uni > 0, ((inter * 1000000L - pmod(inter * 1000000L, uni)) / uni).cast("long"))
          .otherwise(lit(1000000L))
      })
    val nSims = size(sims).cast("long")
    val sumSims = aggregate(sims, lit(0L), (acc, v) => acc + v)
    val hofAvg = when(nSims > 0,
      ((sumSims - pmod(sumSims, nSims)) / nSims).cast("long")).otherwise(lit(500000L))
    val diff = docs.select(hofAvg.as("hof"),
      rewardStats(t).getField("sim_avg_ppm").as("k"))
      .filter(col("hof") =!= col("k"))
      .count()
    assert(diff == 0)
  }

  test("bullet/divider flags == HOF line classifiers") {
    val lines = split(t, "\n")
    def has(re: String) = size(filter(lines, l => l.rlike(re))) > 0
    def divi(ch: String) = {
      val q = java.util.regex.Pattern.quote(ch)
      size(filter(lines, l => trim(l).rlike("^" + q + "{3,}$"))) > 0
    }
    val hofBullet = has("^\\s*[0-9]+[.)]\\s+") || has("^\\s*[A-Za-z][.)]\\s+") ||
      has("^\\s*[-*•]\\s+") || t.contains("•")
    val st = rewardStats(t)
    val diff = docs.select(
      hofBullet.as("hb"), st.getField("bullet_any").as("kb"),
      divi("-").as("h1"), (st.getField("div_dash") > 0).as("k1"),
      divi("=").as("h2"), (st.getField("div_eq") > 0).as("k2"),
      divi("*").as("h3"), (st.getField("div_star") > 0).as("k3"),
      divi("~").as("h4"), (st.getField("div_tilde") > 0).as("k4"))
      .filter(col("hb") =!= col("kb") || col("h1") =!= col("k1") ||
        col("h2") =!= col("k2") || col("h3") =!= col("k3") ||
        col("h4") =!= col("k4"))
      .count()
    assert(diff == 0)
  }

  test("emoji variety fields == regexp_extract_all counts") {
    val emos = regexp_extract_all(t, lit(EmojiClass), lit(0))
    val diff = docs.select(
      size(emos).as("ht"), size(array_distinct(emos)).as("hd"),
      rewardStats(t).getField("emo_total").as("kt"),
      rewardStats(t).getField("emo_distinct").as("kd"))
      .filter(col("ht") =!= col("kt") || col("hd") =!= col("kd"))
      .count()
    assert(diff == 0)
  }

  test("punct/line/hashtag counts == Column formulations") {
    val st = rewardStats(t)
    val tail = element_at(split(t, "\n"), -1)
    val checks = Seq(
      charCount(t, ".").cast("long") -> st.getField("n_period"),
      charCount(t, ",").cast("long") -> st.getField("n_comma"),
      charCount(t, "!").cast("long") -> st.getField("n_exclaim"),
      charCount(t, "?").cast("long") -> st.getField("n_question"),
      charCount(t, ";").cast("long") -> st.getField("n_semicolon"),
      size(split(t, "\n")) -> st.getField("n_lines"),
      regexp_count(tail, lit("#[A-Za-z0-9_]+")) -> st.getField("tail_hashtags"))
    val cond = checks.map { case (hof, k) => hof =!= k }.reduce(_ || _)
    val extra = Seq("#one #two tail #three #four", "line\n#tag1 #tag2",
      "a.b,c!d?e;f\n\n#x").toDF("text")
    assert(docs.union(extra).filter(cond).count() == 0)
  }

  test("style counts == HOF line/token classifiers") {
    val st = rewardStats(t)
    val lines = split(t, "\n")
    def cnt(re: String) = size(filter(lines, l => l.rlike(re)))
    def divc(ch: String) = {
      val q = java.util.regex.Pattern.quote(ch)
      size(filter(lines, l => trim(l).rlike("^" + q + "{3,}$")))
    }
    val checks = Seq(
      size(filter(lines, l => length(l) === 0)) -> st.getField("n_empty"),
      cnt("^\\s*[0-9]+[.)]\\s+") -> st.getField("n_num"),
      cnt("^\\s*[A-Za-z]+[.)]\\s+") -> st.getField("n_let_plus"),
      cnt("^\\s*[^A-Za-z0-9_\\s]") -> st.getField("n_sym"),
      divc("-") -> st.getField("div_dash"),
      divc("=") -> st.getField("div_eq"),
      size(tokens(t)) -> st.getField("tok_total"),
      size(array_distinct(tokens(t))) -> st.getField("tok_distinct"),
      (size(lines) - 1) -> (st.getField("n_lines") - 1))
    val cond = checks.map { case (hof, k) => hof =!= k }.reduce(_ || _)
    assert(docs.filter(cond).count() == 0)
  }

  test("arc codes on known shapes") {
    val rows = Seq(
      "flat here. also flat. still flat." -> 3, // all-zero scores: flat
      "bad day. fine now. good win best." -> 1, // rising ending positive
      "good win best. fine now. bad loss sad." -> 2, // falling ending negative
      "one. two." -> 0, // <3 sentences: neutral
      "good start. bad middle. good end." -> 4) // variable
    rows.foreach { case (text, want) =>
      val got = Seq(text).toDF("text")
        .select(rewardStats(col("text")).getField("arc")).as[Int].head()
      assert(got == want, s"arc($text) = $got, want $want")
    }
  }
}
