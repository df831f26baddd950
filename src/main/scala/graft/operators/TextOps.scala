package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents`: language ID, quality scoring,
  * token counting, fingerprinting. All are shuffle-free single-pass
  * projections (embarrassingly parallel at 100 TB — SURVEY §6) with exact
  * DuckDB mirrors; every ratio is emitted as integer ppm so the oracle
  * hash compares integers.
  */
object TextOps {

  private val docsOrdered = (spark: SparkSession, sfDir: String) =>
    Tables.documents(spark, sfDir)

  // Stopword lists for the n-gram/stopword language heuristic. Tiny,
  // broadcast-free (they live in the plan as literals).
  val EnStops = Seq("the", "a", "of", "and", "is", "to", "in")
  val EsStops = Seq("el", "la", "de", "que", "y", "los")
  val DeStops = Seq("der", "die", "das", "und", "ist", "ein")
  val FrStops = Seq("le", "la", "les", "et", "des", "un")

  private[operators] def sqlTokenHits(set: Seq[String]): String = {
    val lst = set.map(s => s"'$s'").mkString("[", ", ", "]")
    s"length(list_filter(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''), t -> list_contains($lst, t)))"
  }

  /** tx_tokens: whitespace tokens, distinct tokens, BPE-ish subword count,
    * sentence count. */
  def txTokens(spark: SparkSession, sfDir: String): DataFrame =
    docsOrdered(spark, sfDir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("__toks"))
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("__toks"))).cast("long").as("n_distinct"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        sentenceCount(col("text")).cast("long").as("n_sentences"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** tx_bpe: REAL merge-table subword tokenization stats — the token
    * economics operator (budgets in tx_pack/tx_mix/tx_vocab_coverage
    * count tokens; a BPE-driven count is what a training pipeline
    * actually budgets in, where tx_tokens' `n_bpe` is a regex-chunk
    * stand-in). One [[graft.functions.Bpe.Merges]]-driven native pass
    * per doc (staged struct attribute — the kernel evaluates once);
    * the DuckDB mirror is GENERATED from the same merge table as a
    * nested replace chain ([[graft.functions.Bpe.oracleExprs]]), so a
    * table edit cannot desynchronize the engines. Map-only,
    * shuffle-free. cpt_ppm = alpha chars per emitted token (the
    * compression the vocabulary achieves), null for letterless docs. */
  def txBpe(spark: SparkSession, sfDir: String): DataFrame =
    docsOrdered(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.NativeExpressions.bpeSubwordStats(col("text")).as("__b"))
      .select(col("doc_id"),
        col("__b.n_words").as("n_words"),
        col("__b.n_chars").as("n_alpha_chars"),
        col("__b.n_tokens").as("n_bpe_tokens"),
        when(col("__b.n_tokens") > 0,
          expr("__b.n_chars * 1000000 div __b.n_tokens")).as("cpt_ppm"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** tx_bpe_train: distributed BPE merge-table TRAINING — learns the
    * table tx_bpe applies. [[graft.functions.Bpe.TrainRounds]] rounds of
    * most-frequent-adjacent-pair (Sennrich et al. 2016), frequency ties
    * broken lexicographically on (p, q) so the result is deterministic;
    * emits the (rank, p, q, merged, pair_count) table. The DuckDB mirror
    * is the same algorithm unrolled one-CTE-per-round, GENERATED from
    * the same constants ([[graft.functions.Bpe.trainOracleSql]]).
    *
    * Scale shape: the corpus is touched ONCE — the word-frequency
    * aggregate (map-side combine, shuffle ∝ vocabulary, the tx_unigram_lm
    * lesson). Every round then runs over the VOCABULARY table: one
    * adjacent-pair count (weighted by word frequency, map-side
    * combinable), one 1-row argmax collect (the Lloyd's-centroid
    * pattern), one literal-replace merge pass, lineage cut per round by
    * a tracked localCheckpoint. At 100 TB the corpus pass dominates and
    * runs exactly once; rounds cost |vocab|, not |corpus|. */
  def txBpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    bpeTrain(spark, sfDir, graft.functions.Bpe.TrainRounds)

  /** [[txBpeTrain]] under an arbitrary round count — BpeTrainSpec's
    * entry point for small fixtures whose vocabularies exhaust before
    * [[graft.functions.Bpe.TrainRounds]]. */
  private[graft] def bpeTrain(
      spark: SparkSession, sfDir: String, rounds: Int): DataFrame = {
    import spark.implicits._
    import graft.functions.Bpe
    // Words = maximal [a-z]+ runs after the fixed ASCII fold — the
    // apply-side tokenization (Bpe.oracleExprs), NOT locale lower().
    var vocab = Sampling.trackScratch(docsOrdered(spark, sfDir)
      .select(explode(expr(
        s"regexp_extract_all(translate(text, '${Bpe.AsciiUpper}', '${Bpe.AsciiLower}'), '([a-z]+)', 1)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "([a-z])", "[$1]").as("s"), col("cnt"))
      .localCheckpoint(true))
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      // ALL adjacent token pairs of the bracket encoding, weighted by
      // word frequency ("aaa" → (a,a) twice — classic BPE counting).
      val toks = split(expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
      val n = size(toks)
      val win = vocab
        .select(col("cnt"), explode(zip_with(
          slice(toks, lit(1), n - lit(1)), slice(toks, lit(2), n - lit(1)),
          (a, b) => concat_ws(" ", a, b))).as("pq"))
        .select(col("cnt"),
          element_at(split(col("pq"), " "), 1).as("p"),
          element_at(split(col("pq"), " "), 2).as("q"))
        .groupBy(col("p"), col("q")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("p"), col("q"))
        .as[(String, String, Long)].take(1)
      require(win.nonEmpty,
        s"tx_bpe_train: vocabulary exhausted before round $r — lower Bpe.TrainRounds for this corpus")
      val (p, q, c) = win(0)
      merges += ((r.toLong, p, q, p + q, c))
      vocab = Sampling.trackScratch(vocab
        .select(expr(s"replace(s, '[$p][$q]', '[$p$q]')").as("s"), col("cnt"))
        .localCheckpoint(true))
    }
    merges.result().toDF("rank", "p", "q", "merged", "pair_count")
      .orderBy(col("rank"))
  }

  /** Appends `en_hits..fr_hits` + `lang_pred` over a (…, text) frame —
    * ONE definition shared by tx_langid and tx_pattern_canary (the
    * shared-projection lesson: a heuristic edit that doesn't propagate
    * desynchronizes a gate from its canary). Tokenizes once; each
    * stop-set counter scans the shared staged array (the convenience
    * tokenSetCount(text, set) embeds its own tokenizer — 4 tokenize
    * passes per row for the 4 languages). */
  private[operators] def withLangidCols(docs: DataFrame): DataFrame = {
    def hits(set: Seq[String]) =
      graft.functions.NativeExpressions.tokenSetCount(col("__toks"), set).cast("long")
    docs
      .select(col("*"), tokens(col("text")).as("__toks"))
      .select(col("*"),
        hits(EnStops).as("en_hits"), hits(EsStops).as("es_hits"),
        hits(DeStops).as("de_hits"), hits(FrStops).as("fr_hits"))
      .select(col("*"),
        when(hasCjk(col("text")), "zh")
          .when(col("en_hits") === 0 && col("es_hits") === 0 &&
                col("de_hits") === 0 && col("fr_hits") === 0, "unknown")
          .when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") &&
                col("en_hits") >= col("fr_hits"), "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") >= col("fr_hits"), "es")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr").as("lang_pred"))
      .drop("__toks")
  }

  /** tx_langid: stopword-hit language scores with deterministic argmax
    * (CJK chars dominate; ties break en > es > de > fr; no hits →
    * 'unknown'). */
  def txLangid(spark: SparkSession, sfDir: String): DataFrame =
    withLangidCols(docsOrdered(spark, sfDir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("en_hits"), col("es_hits"), col("de_hits"),
        col("fr_hits"), col("lang_pred"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** Per-document quality base (shared by tx_quality and
    * tx_quality_dist): ratios + composite score, all integer-exact. */
  private def qualityBase(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    // shared token array: tokenCount + the stopword counter read one
    // staged tokenize pass instead of embedding one each
    val nTok = size(col("__toks")).cast("long")
    val punct = regexp_count(t, lit("[,.;:!?]")).cast("long")
    val stops = graft.functions.NativeExpressions
      .tokenSetCount(col("__toks"), EnStops).cast("long")
    val lines = filter(split(t, "\n"), l => length(trim(l)) > lit(0))
    val nLines = size(lines).cast("long")
    val nDistinctLines = size(array_distinct(lines)).cast("long")
    docsOrdered(spark, sfDir)
      .select(col("doc_id"), col("source"), t, tokens(t).as("__toks"))
      .select(col("doc_id"), col("source"),
        length(t).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        punct.as("n_punct"),
        stops.as("n_stops"),
        nLines.as("n_lines"),
        nDistinctLines.as("n_dlines"))
      .selectExpr(
        "doc_id", "source", "n_chars", "n_tokens",
        "n_punct * 1000000L div greatest(n_chars, 1L) AS punct_ppm",
        "n_stops * 1000000L div greatest(n_tokens, 1L) AS stop_ppm",
        "(n_lines - n_dlines) * 1000000L div greatest(n_lines, 1L) AS dup_line_ppm")
      .withColumn("quality_ppm",
        expr("least(1000000L, n_tokens * 20000L) div 2 + stop_ppm div 4 + (1000000L - dup_line_ppm) div 4"))
  }

  /** (doc_id, quality_ppm) — the composite score alone, for consumers
    * that join quality into another plan (dd_keep_best): the raw column
    * algebra, no presentation checkpoint/sort (the cur_verdict lesson). */
  private[graft] def qualityScores(spark: SparkSession, sfDir: String): DataFrame =
    qualityBase(spark, sfDir).select(col("doc_id"), col("quality_ppm"))

  /** tx_quality: length/punctuation/stopword/dup-line ratios + an
    * integer-exact composite score. */
  def txQuality(spark: SparkSession, sfDir: String): DataFrame =
    qualityBase(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("punct_ppm"), col("stop_ppm"), col("dup_line_ppm"),
        col("quality_ppm"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** tx_quality_dist: per-source quality-score distribution — count +
    * exact p25/p50/p75/p95 (one map-side-combinable shuffle on source;
    * Spark's exact `percentile` and DuckDB's `quantile_cont` both
    * linear-interpolate, the same equivalence p01's cutoffs rely on). At
    * 100 TB set [[graft.functions.Quantiles.ApproxKey]] on the session —
    * the same call site emits approx_percentile: same plan shape, bounded
    * sketch state instead of a per-group sorted buffer. */
  def txQualityDist(spark: SparkSession, sfDir: String): DataFrame =
    qualityBase(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        graft.functions.Quantiles.pctls(spark, "quality_ppm",
          Seq(0.25, 0.5, 0.75, 0.95)).as("ps"))
      .select(col("source"), col("n_docs"),
        round(element_at(col("ps"), 1), 0).cast("long").as("p25"),
        round(element_at(col("ps"), 2), 0).cast("long").as("p50"),
        round(element_at(col("ps"), 3), 0).cast("long").as("p75"),
        round(element_at(col("ps"), 4), 0).cast("long").as("p95"))
      .orderBy(col("source"))

  /** Corpus-rarity cutoff: a shingle in ≤ this many docs is "novel". */
  val RareDf = 2L

  /** tx_corpus_novelty: corpus-relative novelty scoring — the fraction of
    * a document's 3-gram shingles that are corpus-rare (df ≤ [[RareDf]]).
    * High novelty = unique content; near-zero = boilerplate/template mass
    * (the curation signal dedup thresholds miss).
    *
    * Shingle df is a `groupBy(s).count()` joined back onto the postings —
    * NOT a count window on the shingle partitioning: a window puts every
    * posting of one shingle into a single task, so one boilerplate shingle
    * in 10⁹ documents serializes the stage at scale. The groupBy makes hot
    * keys cheap via map-side partial aggregation, and the equi-join back
    * is skew-splittable by AQE. Postings are explicitly repartitioned on
    * the shingle key first so the aggregate and the join share ONE
    * exchange (ReuseExchange) — the shingle arrays, the expensive part,
    * are computed exactly once. */
  def txCorpusNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.NativeExpressions.wordShingles
    val posting = docsOrdered(spark, sfDir)
      .select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("s"))
      .repartition(col("s"))
    // count(doc_id) ≡ count(*) (doc ids are never null) — referencing the
    // column keeps Catalyst's pruning from narrowing this branch's copy of
    // the exchange, so both sides canonicalize equal and reuse fires.
    val dfTab = posting.groupBy(col("s")).agg(count(col("doc_id")).as("df"))
    posting.join(dfTab, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") <= RareDf, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("novelty_ppm", expr("n_rare * 1000000L div n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Contamination n-gram width — 13 in classic decontamination
    * (GPT-3/Llama style); 5 here so the short synthetic documents
    * exercise the operator — and the deterministic pseudo-benchmark
    * split (every 97th document). */
  val ContamN = 5
  val BenchMod = 97L

  /** tx_contamination: benchmark-overlap decontamination — for every
    * (training doc, benchmark doc) pair sharing at least one
    * [[ContamN]]-gram, the count of shared distinct shingles. The flag
    * every LLM training-data pipeline needs before a corpus ships: a
    * training document that contains benchmark n-grams inflates eval.
    *
    * Scale shape (r17 replica collapse — the dd_simhash/dd_minhash
    * identical-text defense applied here): n_shared is a pure function
    * of the two TEXTS (wordShingles emits the distinct shingle set),
    * so each DISTINCT text is shingled once and the shingle match runs
    * over distinct texts only — on a duplicate-heavy corpus the old
    * per-document form exploded every replica's shingles into the
    * match (R² join work at replica factor R). Doc-level (doc, bench)
    * pairs expand afterwards from the tiny text-pair frame; a text's
    * replicas can sit on BOTH sides of the benchmark split, so the
    * group table carries the corpus ids and bench ids separately. The
    * group shuffle moves (tkey, doc_id) — never text. All
    * corpus-cardinality hints size-gated; above the gate every join
    * degrades to a shuffle equi-join ∝ distinct content. */
  def txContamination(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.NativeExpressions.wordShingles
    val docs = docsOrdered(spark, sfDir)
    val isBench = col("doc_id") % BenchMod === 0
    // Shape decision from MEASURED replica density (the ddIncremental
    // probe): the collapse's fixed costs (group shuffle, two extra
    // checkpoints, expansion joins) only pay when texts actually repeat
    // — at density ~1 it measured a flat +0.5 s on the sf0.1 row for
    // nothing, while at the 100× replica corpus (density 100) the
    // per-document form is R²-quadratic in the match join.
    val (nDocs, nDistinct) = Sampling.textDensity(Tables.documents(spark, sfDir))
    if (nDocs < 2L * nDistinct) {
      // per-document form — the r16 shape: the gated benchmark-shingle
      // broadcast keeps the corpus side a map-only scan + explode
      // feeding a map-side-combinable pair count; above the gate the
      // join shuffles ∝ benchmark size, never ∝ corpus.
      val bench = Sampling.trackScratch(Sampling.countedCheckpoint(
        docs.filter(isBench)
          .select(col("doc_id").as("bench_id"),
            explode(wordShingles(col("text"), ContamN)).as("s"))))
      val corpus = docs.filter(!isBench)
        .select(col("doc_id"), explode(wordShingles(col("text"), ContamN)).as("s"))
      return corpus.join(Sampling.gatedBroadcast(bench), "s")
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"), col("bench_id"))
    }
    val groups = Sampling.trackScratch(Sampling.countedCheckpoint(docs
      .groupBy(md5(col("text")).as("tkey"))
      .agg(min(col("doc_id")).as("rep_id"),
        sort_array(collect_list(when(!isBench, col("doc_id")))).as("cids"),
        sort_array(collect_list(when(isBench, col("doc_id")))).as("bids"))))
    // one shingle pass over DISTINCT texts (rep scan: the gated rep-id
    // broadcast keeps the documents scan map-side; checkpointed — both
    // sides of the shingle match read it)
    val sh = Sampling.trackScratch(Sampling.countedCheckpoint(
      Tables.documents(spark, sfDir)
        .join(Sampling.gatedBroadcast(groups.select(
          col("rep_id").as("doc_id"), col("tkey"),
          (size(col("cids")) > 0).as("hasC"), (size(col("bids")) > 0).as("hasB"))),
          "doc_id")
        .select(col("tkey"), col("hasC"), col("hasB"),
          explode(wordShingles(col("text"), ContamN)).as("s"))))
    val textPairs = sh.filter(col("hasC")).select(col("tkey").as("ck"), col("s"))
      .join(Sampling.gatedBroadcast(
        sh.filter(col("hasB")).select(col("tkey").as("bk"), col("s"))), "s")
      .groupBy(col("ck"), col("bk"))
      .agg(count(lit(1)).as("n_shared"))
    // doc-level expansion: output-bound explodes from the compact frame
    textPairs
      .join(Sampling.gatedBroadcast(groups.select(col("tkey").as("ck"),
        col("cids"))), "ck")
      .join(Sampling.gatedBroadcast(groups.select(col("tkey").as("bk"),
        col("bids"))), "bk")
      .select(explode(col("cids")).as("doc_id"), col("bids"), col("n_shared"))
      .select(col("doc_id"), explode(col("bids")).as("bench_id"), col("n_shared"))
      .orderBy(col("doc_id"), col("bench_id"))
  }

  /** Token budget per packed training sequence. */
  val PackBudget = 512L

  /** tx_pack: sequence packing — assign documents (in doc_id order) to
    * fixed-token-budget training sequences with concat-then-chunk
    * semantics (`seq_id = tokens-before-this-doc div budget`, the
    * standard LM-pretraining packing: documents are concatenated in
    * order and split at budget boundaries, so a doc straddling a
    * boundary starts in the sequence its first token lands in).
    *
    * The running token count is a GLOBAL prefix sum — `sum() OVER
    * (ORDER BY doc_id)` funnels the corpus through one task, so like
    * q_decile it runs two-phase: repartitionByRange totally orders the
    * partitions, the per-partition cumsum is a local window, and the
    * cross-partition offset comes from the tiny per-partition totals
    * table (32 rows), broadcast. Token counts are one native-kernel
    * map pass; nothing else touches the text. */
  def txPack(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docsOrdered(spark, sfDir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
    // Materialized once: the rank pass and the per-partition totals both
    // read it (two lazy branches would re-scan + re-range-sample).
    val ranged = Sampling.trackScratch(toks.repartitionByRange(32, col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
    val local = ranged.withColumn("__lcum", sum(col("n_tokens")).over(wLocal))
    val wOrd = Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
    val offs = ranged.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("__t"))
      .select(col("__pid"),
        coalesce(sum(col("__t")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off"))
    local.join(broadcast(offs), "__pid")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(__lcum + __off - n_tokens) div $PackBudget").as("seq_id"))
      .orderBy(col("doc_id"))
  }

  /** A collocation must appear in at least this many documents. */
  val MinPairDf = 5L

  /** tx_collocations: corpus-level collocation mining — bigram document-
    * frequency "lift": how much more often two tokens co-occur adjacently
    * than their independent document frequencies predict,
    * lift = df_ab·N / (df_a·df_b), emitted integer-exact with FIXED
    * associativity ((df_ab·10⁶ div df_a)·N div df_b) so both engines
    * compute the identical integer. Two map-side-combinable counts
    * (per-doc-distinct unigrams, per-doc-distinct bigram shingles); the
    * vocabulary-sized unigram table broadcasts onto the bigram counts (at
    * 100 TB a web-scale vocabulary may exceed the broadcast cap — the same
    * plan with shuffle joins on tok_a/tok_b is the fallback, still ∝
    * vocab, never ∝ corpus). */
  def txCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.NativeExpressions.wordShingles
    val docs = docsOrdered(spark, sfDir)
    val uni = docs.select(explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df_tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val bi = docs.select(explode(wordShingles(col("text"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= MinPairDf)
      // single-token docs fall back to a space-free whole-doc "shingle"
      .filter(col("bg").contains(" "))
      .select(element_at(split(col("bg"), " "), 1).as("tok_a"),
        element_at(split(col("bg"), " "), 2).as("tok_b"), col("df_ab"))
    val ua = uni.select(col("tok").as("tok_a"), col("df_tok").as("df_a"))
    val ub = uni.select(col("tok").as("tok_b"), col("df_tok").as("df_b"))
    bi.join(broadcast(ua), "tok_a").join(broadcast(ub), "tok_b")
      .crossJoin(broadcast(nDocs))
      .selectExpr("tok_a", "tok_b", "df_ab",
        "(df_ab * 1000000L div df_a) * n_docs div df_b AS lift_ppm")
      .orderBy(col("lift_ppm").desc, col("tok_a"), col("tok_b"))
      .limit(100)
  }

  /** tx_readability: LIX readability index — average sentence length plus
    * long-word percentage, the classic grade-level heuristic re-expressed
    * integer-exact: lix_centi = 100·words/sentences + 10000·longwords/words
    * (a long word has ≥ 7 non-space chars; `\S{7,}` counts each maximal
    * run once). Map-only single pass like the other tx_* projections. */
  def txReadability(spark: SparkSession, sfDir: String): DataFrame = {
    val t = col("text")
    docsOrdered(spark, sfDir)
      .select(col("doc_id"),
        tokenCount(t).cast("long").as("n_words"),
        sentenceCount(t).cast("long").as("n_sentences"),
        regexp_count(t, lit("\\S{7,}")).cast("long").as("n_long"))
      .selectExpr("doc_id", "n_words", "n_sentences", "n_long",
        "n_words * 100L div greatest(n_sentences, 1L) + " +
          "n_long * 10000L div greatest(n_words, 1L) AS lix_centi")
      .transform(Sampling.presentSorted(_, col("doc_id")))
  }

  /** The fixed keyword query [[txBm25]] ranks against — corpus-frequent
    * terms so the ranking is exercised end-to-end; production callers
    * parameterize. */
  val Bm25Query = Seq("spark", "window", "join")
  val Bm25TopK = 20

  /** tx_bm25: BM25 keyword retrieval (Robertson/Okapi; k1 = 1.2,
    * b = 0.75) — top-[[Bm25TopK]] documents for [[Bm25Query]]. The score
    * algebra is integer-exact: with A = Σdl (total corpus tokens) and N
    * docs, the per-term denominator tf + k1·(1−b) + k1·b·dl·N/A is
    * scaled by 10·A into 10·A·tf + 3·A + 9·N·dl, so contrib_ppm =
    * idf_ppm·22·A·tf div that — identical integer division on both
    * engines, and the per-doc sum is order-independent. The products
    * run in DECIMAL(38,0) (DuckDB: HUGEINT), like p21_optimize_k's
    * inertia: idf_ppm·22·A·tf ≲ 6·10²⁷ even at 10¹³ corpus tokens,
    * far under the 10³⁸ ceiling, where a BIGINT algebra would wrap
    * (silently, mis-ranking) past ~10¹⁰ tokens on rare terms. The
    * quotient is ≈ 2.2·idf_ppm — always BIGINT-safe. The only float is
    * the idf itself, ln(1 + (N−df+0.5)/(df+0.5)), rounded to ppm
    * BEFORE entering the integer algebra (the same one-float-then-
    * fix-point seam the p21 silhouette uses).
    *
    * Scale shape: ONE corpus text pass — the narrow (doc_id, dl,
    * query-term hits) projection is checkpointed, so the corpus stats
    * aggregate, the df count, and the scoring join all reuse it
    * (without the checkpoint Catalyst re-evaluates the tokenize
    * subtree once per reference: 4 full corpus scans; the same
    * one-text-pass discipline dd_softdedup and dd_minhash_estimate
    * pin). The query-term filter runs BEFORE any shuffle, so the
    * grouped state is O(matching docs × |query|); df/N/A are tiny
    * broadcast aggregates; the final top-k is TakeOrdered (partial
    * per-partition top-k, no global sort), and the rank window runs
    * post-limit over [[Bm25TopK]] rows. */
  def txBm25(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docsOrdered(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => t.isin(Bm25Query: _*)).as("qtoks"))
      .transform(df => Sampling.trackScratch(df.localCheckpoint()))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("a_toks"))
    val posting = base
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("tok"))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val idf = posting.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("tok"),
        round(log(lit(1d) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) * 1000000, 0).cast("long").as("idf_ppm"))
    val ranked = posting.join(broadcast(idf), "tok").crossJoin(broadcast(stats))
      .selectExpr("doc_id",
        """CAST(idf_ppm AS DECIMAL(38,0)) * (22 * CAST(a_toks AS DECIMAL(38,0)) * tf)
          |  div (10 * CAST(a_toks AS DECIMAL(38,0)) * tf
          |       + 3 * CAST(a_toks AS DECIMAL(38,0))
          |       + 9 * CAST(n_docs AS DECIMAL(38,0)) * dl)
          |  AS contrib_ppm""".stripMargin)
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib_ppm")).as("score_ppm"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(Bm25TopK)
    val w = Window.orderBy(col("score_ppm").desc, col("doc_id"))
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("score_ppm"), col("n_terms"))
      .orderBy(col("rank"))
  }

  val TfidfTopK = 3

  /** tx_tfidf: per-document keyword extraction — the [[TfidfTopK]]
    * highest-TF-IDF terms per doc (tfidf_ppm = tf · idf_ppm with
    * idf_ppm = round(ln(N/df)·10⁶): one float, ppm-fixed before the
    * integer multiply, like [[txBm25]]). Ties break to the
    * lexicographically smaller term on both engines.
    *
    * Scale shape: the vocab-sized df/idf table broadcasts (same seam as
    * tx_unigram_lm); per-doc selection is a collect-sort-slice aggregate
    * — state bounded by distinct-terms-per-doc, map-side combinable —
    * NOT a corpus-wide rank window (the oracle's row_number form is the
    * semantic mirror, not the plan). The tf posting table is
    * checkpointed: it feeds both the df/idf aggregate and the scoring
    * join, and without the checkpoint each reference re-runs the full
    * tokenize + explode + shuffle. n_docs stays a separate count-only
    * scan (column-pruned to parquet metadata) because it must count
    * ALL documents, including any row the tokenizer drops. */
  def txTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = docsOrdered(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .transform(df => Sampling.trackScratch(df.localCheckpoint()))
    val nDocs = docsOrdered(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val idf = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"),
        round(log(col("n_docs").cast("double") / col("df")) * 1000000, 0)
          .cast("long").as("idf_ppm"))
    tf.join(broadcast(idf), "tok")
      .select(col("doc_id"),
        struct((col("tf") * col("idf_ppm") * -1).as("neg"), col("tok"),
          col("tf"), (col("tf") * col("idf_ppm")).as("tfidf_ppm")).as("e"))
      .groupBy(col("doc_id"))
      .agg(slice(array_sort(collect_list(col("e"))), 1, TfidfTopK).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.tok").as("tok"), col("e.tf").as("tf"),
        col("e.tfidf_ppm").as("tfidf_ppm"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** tx_fingerprint: normalized md5 fingerprint (case/punct-jitter-robust
    * exact-dup key; reference dedup norm per 7-clean-topics.py charset
    * rules, re-expressed). */
  def txFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docsOrdered(spark, sfDir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** Count-min-sketch geometry for [[txHeavyHitters]]: depth (independent
    * hash rows) × width (buckets per row) = the sketch's whole state —
    * [[CmsDepth]]·[[CmsWidth]] longs, regardless of corpus size. */
  val CmsDepth = 4
  val CmsWidth = 1024L
  val HhThreshold = 500L

  /** Per-token count-min estimates next to the exact counts — shared by
    * tx_heavy_hitters and HeavyHitterSpec's property tests. The counters
    * are derived from the exact tf table (counter[i][b] = Σ tf over
    * tokens with hᵢ(tok)=b — identical to streaming `+1` per occurrence,
    * because addition commutes), so one corpus pass feeds both the
    * sketch and its ground truth. */
  /** The [[CmsDepth]] bucket hashes of a token — ONE definition shared
    * by [[hhCms]] and the streaming
    * [[graft.streaming.EventStreams.cmsCounters]], so the batch-built
    * and stream-built sketches are the same sketch. */
  private[graft] def cmsHashes(tok: Column): Column =
    array((0 until CmsDepth).map { i =>
      pmod(hexLong(md5(concat(lit(s"cms$i#"), tok)), 8), lit(CmsWidth))
    }: _*)

  private[graft] def hhCms(docs: DataFrame): DataFrame = {
    val tf = Sampling.trackScratch(
      docs.select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(true))
    val hashed = tf.select(col("tok"), col("tf"),
      posexplode(cmsHashes(col("tok"))).as(Seq("row_i", "bucket")))
    val counters = hashed.groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("tf")).as("cnt"))
    hashed.join(broadcast(counters), Seq("row_i", "bucket"))
      .groupBy(col("tok"))
      .agg(min(col("cnt")).as("est"), max(col("tf")).as("exact_tf"))
  }

  /** tx_heavy_hitters: frequent-token detection via a count-min sketch
    * (Cormode–Muthukrishnan), reported next to the exact counts so the
    * one-sided error (est ≥ exact, always) is visible per row.
    *
    * Scale shape: the sketch state is [[CmsDepth]]×[[CmsWidth]] longs
    * TOTAL — a map-side-combinable aggregate whose shuffle is ≤4096 rows
    * at any corpus size; that is the sketch's whole point, and at 100 TB
    * it is the only part that must see every token occurrence. The exact
    * tf table (needed here anyway as the estimate's ground truth, and
    * checkpointed so the corpus tokenize-explode pass runs once) is
    * vocabulary-sized, not corpus-sized; querying the sketch is a
    * broadcast join of the tiny counter table onto the candidate
    * tokens. Estimates are pure integer algebra — hash-exact vs the
    * DuckDB mirror with no rounding. */
  def txHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    hhCms(docsOrdered(spark, sfDir))
      .filter(col("est") >= HhThreshold)
      .select(col("tok"), col("est"), col("exact_tf"),
        (col("est") - col("exact_tf")).as("overcount"))
      .orderBy(col("est").desc, col("tok"))

  /** Coverage targets (percent of total token mass) for
    * [[txVocabCoverage]] — the budgets a tokenizer build asks about. */
  val VocabTargets = Seq(50L, 90L, 99L)

  /** tx_vocab_coverage: tokenizer-budget planning — for each coverage
    * target, the smallest frequency-ranked vocabulary whose cumulative
    * token mass reaches it (the Zipf/coverage curve read at 50/90/99%).
    *
    * Scale shape: the corpus collapses to the vocabulary-sized tf table
    * in one map-side-combinable pass; the rank/cumsum window then runs
    * over VOCAB rows, not corpus rows (the same vocab-table seam as
    * tx_unigram_lm/tx_tfidf — at 100 TB that is millions of rows, one
    * modest sort, while the corpus itself is never globally ordered).
    * Ties rank deterministically (tf desc, token asc) and the cumsum is
    * a sum of longs — hash-exact against the mirror. */
  def txVocabCoverage(spark: SparkSession, sfDir: String): DataFrame =
    vocabCoverage(docsOrdered(spark, sfDir))

  /** [[txVocabCoverage]] over any (doc_id, text) frame — shared with
    * VocabCoverageSpec's hand-checked Zipf fixtures. */
  private[graft] def vocabCoverage(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val tf = docs
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    // Single-window rank/cumsum over the VOCAB table is deliberate (the
    // documented vocab-table seam): vocab ≪ corpus, and the two-phase
    // Sampling.globalRank alternative measured pure overhead here. A
    // corpus whose vocabulary itself outgrows one sort task can switch
    // this line to globalRank(tf, ..., cumOf = ...) unchanged.
    val w = Window.orderBy(col("tf").desc, col("tok"))
    val ranked = tf
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("tf")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .transform(df => Sampling.trackScratch(df.localCheckpoint(true)))
    val total = ranked.agg(max(col("cum")).as("total"))
    val targets = spark.range(VocabTargets.length)
      .select(element_at(
        array(VocabTargets.map(lit): _*), col("id").cast("int") + 1).as("target_pct"))
    // The whole 3-row (target_pct × total) frame is hinted as the
    // nested-loop BUILD side: the inner broadcast(total) hint is
    // consumed by the crossJoin, so without the outer hint the non-equi
    // join's side choice fell to size estimation — which at scale could
    // flip to broadcasting the vocab table.
    ranked
      .join(broadcast(targets.crossJoin(broadcast(total))),
        col("cum") * 100 >= col("target_pct") * col("total"))
      .groupBy(col("target_pct"), col("total"))
      .agg(min(struct(col("rank"), col("cum"))).as("first"))
      .select(col("target_pct"),
        col("first.rank").as("vocab_size"),
        col("first.cum").as("covered"),
        col("total"))
      .orderBy(col("target_pct"))
  }

  /** PII (tag, regex) pairs in APPLICATION order — one source of truth
    * for the Spark columns and the DuckDB mirror, like
    * [[graft.operators.Balance]]'s synonym table. URLs redact first so
    * an address embedded in a link is counted (and masked) as the link;
    * IPs before phones so dotted quads never re-match as digit runs.
    * Patterns stay inside the syntax Java regex and RE2 share (no
    * lookaround, no backreferences), so both engines see the same
    * language. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("url", "https?://[^\\s]+"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"),
    // Phone shapes, not "any 8+ digit/separator run" (which redacted
    // dates, numeric IDs, and number columns as phones): a leading-+
    // international form; 3/4-group forms whose FIRST and LAST groups
    // have ≥3 digits (excludes ISO dates 4-2-2 and 2-digit-column
    // spans); the US 3-4 local form; or a bare 7-15 digit run (\b-
    // anchored, so longer IDs don't clip). At most ONE [- ] between
    // digit groups. No lookaround — the Java-regex ∩ RE2 subset the
    // oracle mirror requires.
    ("phone", "\\+\\d{1,4}([\\- ]?\\d{2,4}){1,4}\\b" +
      "|\\b\\d{3,4}[\\- ]\\d{2,4}[\\- ]\\d{3,4}([\\- ]\\d{3,4})?\\b" +
      "|\\b\\d{3}[\\- ]\\d{4}\\b" +
      "|\\b\\d{7,15}\\b"))

  /** The tx_pii output column names, in emission order. */
  private[graft] val PiiOutCols =
    Seq("n_url", "n_email", "n_ip", "n_phone", "n_pii", "red_chars", "red_fp")

  /** Appends the tx_pii columns ([[PiiOutCols]]) for text column `t` —
    * ONE staged projection chain shared verbatim by the batch operator
    * and the streaming [[graft.streaming.EventStreams.piiGate]], and
    * drivable by PiiSpec on constructed documents (the synthetic corpus
    * contains no PII-shaped strings; the gate proves the chain, the
    * spec proves the signal). Each pattern counts on the PREVIOUSLY
    * redacted text, so counts and masks are consistent with the
    * declared application order.
    *
    * Two scan-cost properties (the 125→~8 s rewrite at the 100×
    * corpus; results are bit-identical):
    *  - **Literal prefilters** (the grep/Hyperscan trick): each
    *    pattern's count AND replace are gated on a required literal of
    *    the pattern in the RAW text — "http" for url, "@" for email, a
    *    digit for ip/phone — via `instr`/one trivial char-class scan.
    *    Sound: every match contains its literal, and redaction tokens
    *    (`<URL>`…) introduce none of them, so a stage-k match implies
    *    the literal in the raw text. Docs without triggers (most of any
    *    real corpus) never pay the backtracking regex engines.
    *  - **Named redaction stages**: each intermediate redaction level
    *    is a named column in its own projection, so every regex runs
    *    once per row. Folding the chain into one projection re-nests
    *    the replace tree under every consuming column (~28 regex
    *    applications per row instead of 8 — CollapseProject keeps the
    *    stages apart here precisely because the shared columns are
    *    non-cheap). */
  private[graft] def withPiiCols(docs: DataFrame, t: Column): DataFrame = {
    var d = docs
      .withColumn("__red", t)
      .withColumn("__g_url", instr(t, "http") > 0)
      .withColumn("__g_email", instr(t, "@") > 0)
      .withColumn("__g_num", t.rlike("[0-9]"))
    val gateOf = Map("url" -> col("__g_url"), "email" -> col("__g_email"),
      "ip" -> col("__g_num"), "phone" -> col("__g_num"))
    for ((tag, re) <- PiiPatterns) {
      d = d
        .withColumn(s"n_$tag",
          when(gateOf(tag), regexp_count(col("__red"), lit(re)).cast("long"))
            .otherwise(lit(0L)))
        .withColumn("__red",
          when(gateOf(tag),
            regexp_replace(col("__red"), re, s"<${tag.toUpperCase}>"))
            .otherwise(col("__red")))
    }
    d.withColumn("n_pii",
        col("n_url") + col("n_email") + col("n_ip") + col("n_phone"))
      .withColumn("red_chars", length(col("__red")).cast("long"))
      .withColumn("red_fp", md5(col("__red")))
      .drop("__red", "__g_url", "__g_email", "__g_num")
  }

  /** [[withPiiCols]] applied to a (doc_id, text) frame. */
  private[graft] def piiProject(docs: DataFrame): DataFrame =
    withPiiCols(docs, col("text"))
      .select(("doc_id" +: PiiOutCols).map(col): _*)

  /** tx_pii: PII detection + redaction — per-document counts of
    * URL/email/IP/phone matches and the fully masked text (length +
    * fingerprint). Map-only, shuffle-free, whole-stage-codegen regex —
    * embarrassingly parallel at 100 TB like the other single-pass
    * projections; this is the scrub stage every distributed training
    * corpus runs before release. */
  def txPii(spark: SparkSession, sfDir: String): DataFrame =
    piiProject(docsOrdered(spark, sfDir).select(col("doc_id"), col("text")))
      .transform(Sampling.presentSorted(_, col("doc_id")))

  /** Chunk window (tokens) and stride for [[txChunk]]; stride < window
    * gives the 8-token overlap retrieval chunkers use so no boundary
    * context is lost between adjacent chunks. */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** tx_chunk: sliding-window token chunking — split every document
    * into [[ChunkTokens]]-token windows starting every [[ChunkStride]]
    * tokens (the retrieval/pretraining chunker: overlapping fixed-size
    * pieces, final partial window kept). One start offset per
    * `sequence(0, n_tokens-1, stride)` element, then a builtin `slice` +
    * `array_join` per chunk — map-only explode, shuffle-free, all
    * whole-stage codegen. At 100 TB this is a pure linear scan whose
    * output fan-out is n_tokens/stride per doc; the only shuffle in the
    * plan is the oracle-parity ORDER BY. */
  def txChunk(spark: SparkSession, sfDir: String): DataFrame =
    chunk(docsOrdered(spark, sfDir))

  /** [[txChunk]] over any (doc_id, text) frame (fixture-testable form).
    *
    * Ordering comes from sorting the DOCUMENTS (range partition +
    * within-partition sort on the unique doc_id) and only then
    * exploding: sequence→explode preserves element order, so rows
    * emerge totally ordered by (doc_id, chunk_idx) — identical to an
    * `orderBy` on the result, without ever sorting the fan-out. At
    * 100× a result-side sort moved ~27 GB of chunk text through one
    * node's sorter (87.5 s, superlinear under spill); the pre-explode
    * sort moves the raw corpus only (measured 3.4 s, sublinear). */
  private[graft] def chunk(docs: DataFrame): DataFrame =
    docs
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(ChunkStride))).as("start_tok"))
      .select(col("doc_id"),
        expr(s"CAST(start_tok div $ChunkStride AS BIGINT)").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        size(slice(col("toks"), col("start_tok") + 1, lit(ChunkTokens)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(ChunkTokens)), " ")
          .as("chunk_text"))

  /** Disjoint block size (tokens) and document-frequency threshold for
    * [[txBoilerplate]]. df ≥ 2 marks any block shared verbatim across
    * documents — on this corpus that is exactly the replica-duplicated
    * content, the same signal C4's line-dedup keys on. */
  val BoilerBlock = 8
  val BoilerMinDf = 2L

  /** tx_boilerplate: corpus-level boilerplate scrub — the C4/CCNet
    * "remove lines occurring in more than one document" stage
    * re-expressed over disjoint [[BoilerBlock]]-token blocks (this
    * corpus has no newlines, so the dedup unit is a fixed token block
    * rather than a line; same algorithm, same df-threshold semantics).
    * Pass 1 computes each distinct block's document frequency (per-doc
    * distinct first, so a block repeated inside one doc counts once);
    * pass 2 drops every occurrence of a block with df ≥ [[BoilerMinDf]]
    * and reassembles the surviving blocks in order.
    *
    * Scale shape: the df aggregation is two hash shuffles with map-side
    * combine (distinct on (doc_id, block), then count by block). The
    * heavy set — blocks at/above the threshold — is Zipf-small
    * (bounded by total_blocks/MinDf, in practice a few-per-mille of
    * distinct content; C4 holds its frequent-line set in memory the
    * same way), so it broadcasts and the scrub join is map-side with NO
    * skew exposure: a block occurring in millions of documents never
    * becomes a shuffle hot key because the occurrences stay put.
    * Reassembly state is bounded per document (collect of kept blocks,
    * sorted by block index in one array op). */
  def txBoilerplate(spark: SparkSession, sfDir: String): DataFrame =
    boilerplate(docsOrdered(spark, sfDir))

  /** [[txBoilerplate]] over any (doc_id, text) frame (fixture-testable
    * form).
    *
    * r17 rewrite, two ideas composed (guide §2.3 "shuffle keys, not
    * payloads", §2.4, §8):
    *
    * 1. REPLICA COLLAPSE — every output column is a function of the
    *    TEXT (given the heavy set), and a block's document frequency is
    *    Σ group-size over the distinct texts containing it, so each
    *    DISTINCT text is tokenized/blockified exactly once and per-doc
    *    rows expand at the end from the (tkey, ids) group table. The
    *    group shuffle moves (tkey, doc_id) — never text.
    * 2. ARRAY-DOMAIN SCRUB — the relational form shuffled block TEXT
    *    three times (per-doc distinct, df count, reassembly
    *    collect_list). Per-text block arrays are checkpointed once; the
    *    per-text distinct is an in-row first-occurrence test
    *    (array_position == index, no shuffle); the df count ships
    *    map-combined (block, Σg) partials; the scrub re-attaches only
    *    heavy-hit block INDICES per text, so reassembly is an in-row
    *    array filter.
    *
    * Outputs are identical: df ≥ MinDf over Σg equals the per-doc
    * distinct count (replicas contain the same blocks), n_boiler counts
    * heavy OCCURRENCES, kept blocks stay in block-index order, and
    * n_kept_tokens = tokenCount(text_clean) because blocks are
    * single-space joins of non-empty tokens. BoilerArtifactSpec
    * differentials this form against the relational scrub (kept for
    * the artifact path) and the streaming gate. */
  private[graft] def boilerplate(docs: DataFrame): DataFrame = {
    val groups = Sampling.trackScratch(Sampling.countedCheckpoint(docs
      .groupBy(md5(col("text")).as("tkey"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("g"),
        sort_array(collect_list(col("doc_id"))).as("ids"))))
    // one blockify pass over DISTINCT texts (gated rep-id broadcast
    // keeps the docs scan map-side)
    val base = Sampling.trackScratch(Sampling.countedCheckpoint(docs
      .join(Sampling.gatedBroadcast(
        groups.select(col("rep_id").as("doc_id"), col("tkey"), col("g"))), "doc_id")
      .select(col("tkey"), col("g"), blockTexts(tokens(col("text"))).as("__bts"))))
    // one row per block occurrence of a distinct text, with its in-text
    // index and a first-occurrence flag (the per-text distinct, in-row)
    def occ = base
      .select(col("tkey"), col("g"), col("__bts"),
        posexplode(col("__bts")).as(Seq("bi", "bt")))
      .withColumn("__fst", array_position(col("__bts"), col("bt")) === col("bi") + 1)
      .drop("__bts")
    val heavy = Sampling.trackScratch(Sampling.countedCheckpoint(
      occ.filter(col("__fst")).groupBy(col("bt"))
        .agg(sum(col("g")).as("df"))
        .filter(col("df") >= BoilerMinDf)
        .select(col("bt"))))
    // heavy-hit block indices per distinct text — ints
    val hits = Sampling.trackScratch(Sampling.countedCheckpoint(
      occ.join(Sampling.gatedBroadcast(heavy), "bt")
        .groupBy(col("tkey"))
        .agg(sort_array(collect_list(col("bi"))).as("__hidx"))))
    val scrubText = base
      .join(Sampling.gatedBroadcast(hits), Seq("tkey"), "left")
      .withColumn("__hidx",
        coalesce(col("__hidx"), array().cast("array<int>")))
      .withColumn("__kept",
        filter(col("__bts"), (b, i) => !array_contains(col("__hidx"), i)))
      .withColumn("text_clean", array_join(col("__kept"), " "))
      .select(col("tkey"),
        size(col("__bts")).cast("long").as("n_blocks"),
        size(col("__hidx")).cast("long").as("n_boiler"),
        tokenCount(col("text_clean")).cast("long").as("n_kept_tokens"),
        col("text_clean"))
    // doc-level expansion from the compact frames; the ORDER BY's range
    // sampling re-runs only this cheap join+explode, never the scrub
    scrubText
      .join(Sampling.gatedBroadcast(groups.select(col("tkey"), col("ids"))), "tkey")
      .select(explode(col("ids")).as("doc_id"),
        col("n_blocks"), col("n_boiler"), col("n_kept_tokens"), col("text_clean"))
      .orderBy(col("doc_id"))
  }

  /** The disjoint [[BoilerBlock]]-token block texts of a token array —
    * ONE definition shared by the batch scrub (exploded relational
    * form) and the streaming
    * [[graft.streaming.EventStreams.boilerplateGate]] (per-row array
    * form), so the two block decompositions cannot drift. */
  private[graft] def blockTexts(toks: Column): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(BoilerBlock)),
      s => array_join(slice(toks, s + 1, lit(BoilerBlock)), " "))

  /** One row per (doc, block): index, token count, block text. Block
    * token counts re-tokenize the block text — exact, because blocks
    * are single-space joins of non-empty tokens. */
  private def blockify(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(blockTexts(tokens(col("text")))).as(Seq("bi", "bt")))
      .select(col("doc_id"), col("bi").cast("long").as("bi"),
        tokenCount(col("bt")).cast("long").as("bn"), col("bt"))

  /** The heavy (df ≥ [[BoilerMinDf]]) block set of a blockified corpus —
    * the trainable artifact of the scrub (C4's frequent-line set). */
  private[graft] def boilerHeavy(blocks: DataFrame): DataFrame =
    blocks.select(col("doc_id"), col("bt")).distinct()
      .groupBy(col("bt")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerMinDf)
      .select(col("bt"))

  /** Drop every occurrence of a heavy block; reassemble survivors in
    * block order with per-doc counts. */
  // The heavy set is corpus-vocabulary-growing, so its broadcast is
  // size-gated (callers pass it checkpointed or artifact-backed — the
  // gate's count is metadata-cheap); past the gate the scrub join
  // shuffles on the block text, which is the correct price when the
  // frequent-line table itself outgrows an executor.
  private def boilerScrub(blocks: DataFrame, heavy: DataFrame): DataFrame =
    blocks.join(Sampling.gatedBroadcast(heavy.withColumn("__h", lit(1L))), Seq("bt"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        coalesce(sum(when(col("__h").isNotNull, 1L)), lit(0L)).as("n_boiler"),
        coalesce(sum(when(col("__h").isNull, col("bn"))), lit(0L)).as("n_kept_tokens"),
        array_join(transform(
          array_sort(collect_list(when(col("__h").isNull,
            struct(col("bi"), col("bt"))))),
          x => x.getField("bt")), " ").as("text_clean"))
      .orderBy(col("doc_id"))

  /** Persist the corpus's heavy block set — the train half of the
    * scrub's train/use split (same deployment shape as
    * [[graft.operators.Dedup.writeSignatureArtifact]]): compute the
    * frequent-block set ONCE over the stored corpus, then apply it to
    * later batches or an ingest stream without re-aggregating 100 TB. */
  def writeBoilerplateArtifact(spark: SparkSession, sfDir: String, path: String): Unit =
    boilerHeavy(blockify(docsOrdered(spark, sfDir)))
      .write.mode("overwrite").parquet(path)

  /** The use half: scrub the corpus against a persisted heavy set.
    * Hash-identical to [[txBoilerplate]] when the artifact was built on
    * the same corpus (differential-pinned by BoilerArtifactSpec). */
  def boilerplateFromArtifact(spark: SparkSession, sfDir: String, path: String): DataFrame =
    boilerScrub(blockify(docsOrdered(spark, sfDir)),
      spark.read.parquet(path))

  /** tx_source_stats: the per-source "domain table" a pretraining mix
    * is planned from — per source: document count, token mass and its
    * corpus share (ppm), distinct content fingerprints, and the exact-
    * duplicate rate (docs beyond the first of each fingerprint, ppm).
    * tx_quality_dist gives the quality axis per source; this gives the
    * volume + duplication axes; tx_mix consumes such weights.
    *
    * Scale shape: one map pass (token count + fingerprint are native
    * kernels) into a (source, fp)-then-source two-phase distinct
    * aggregate, both map-side-combinable; the corpus token total is a
    * one-row broadcast. Output is |sources| rows. */
  def txSourceStats(spark: SparkSession, sfDir: String): DataFrame = {
    val bySrc = docsOrdered(spark, sfDir)
      .select(col("source"),
        tokenCount(col("text")).cast("long").as("nt"),
        fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        countDistinct(col("fp")).as("n_distinct_fp"))
    val total = bySrc.agg(sum(col("n_tokens")).as("__t"))
    bySrc.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000L div __t").as("token_share_ppm"),
        col("n_distinct_fp"),
        expr("(n_docs - n_distinct_fp) * 1000000L div n_docs").as("dup_ppm"))
      .orderBy(col("source"))
  }

  /** Pattern-canary fixture: constructed PII-shaped and emoji-shaped
    * strings, EMBEDDED like the synonym/UTS-51 tables so the oracle
    * gate exercises the regex/scanner semantics on strings that
    * actually match. The synthetic corpus is pattern-clean, which made
    * the tx_pii / emoji gates trivially green while cross-engine
    * semantic drift stayed invisible — this round's emoji episode
    * (Java-backtracking vs RE2 over the sequence grammar) is exactly
    * the class of divergence this table pins every round. Covers each
    * PII pattern shape, the documented phone false-positive set (dates,
    * ID runs, number columns), every emoji grammar branch, and the
    * mask application order. */
  private[graft] val CanaryRows: Seq[(Long, String)] = Seq(
    0L -> "call +1 555-867-5309 or 0044 20 7946 0958 today",
    1L -> "released 2026-01-01, updated 1999-12-31, order 123456 shipped",
    2L -> "series 10 20 30 40 50 and trace 1234567890123456789 logged",
    3L -> "mail jane.doe+x@example.co.uk via https://example.com/a?b=c&d=e",
    4L -> "server 10.0.0.1 and 192.168.254.3 mask before phone digit runs",
    5L -> "fax 5551234567 or local 555-8675, backup 0151-496-0780",
    6L -> ("love ❤️ and 👍🏽 and " +
      "👨‍👩‍👧"),
    7L -> ("flags 🇺🇸🇫🇷 lone " +
      "🇺 keycap 1️⃣ #⃣"),
    8L -> "fire 🔥 rocket 🚀 arrow ↓ © ® ™ ☀️",
    9L -> "mixed: https://x.io/mailto/a@b.co then a@b.co, dial 555-123-4567 by 2026-03-01",
    // r11 extension: the other native-kernel families the synthetic
    // corpus exercises only benignly (r10 verdict item 7).
    // 10: tokenizer whitespace edges —  (vertical tab) is Java \s
    // but NOT RE2 \s (the divergence this row found; see
    // Kernels.isWsChar), NBSP/thin/em/ideographic spaces are \s on
    // NEITHER engine and glue their neighbors into one token.
    10L -> ("vt\u000Bglues nbsp\u00A0glues thin\u2009glues" +
      " em\u2003glues ideo\u3000glues \t\f\r real\n ws"),
    // 11: langid tie-break ladder — 'la'/'de' hit es+fr / de+fr, 'le'
    // hits fr only; equal-hit ties must break en > es > de > fr.
    11L -> "la de la de le les und die the of und ist",
    // 12: CJK dominance — stopword hits present but a single CJK char
    // must force 'zh'.
    12L -> "the of and is to in 漢 but chinese wins",
    // 13: no stopword hits at all → 'unknown' (not 'en').
    13L -> "zzz qqq xyzzy plugh flurble",
    // 14: winnow tie rule — identical repeated 3-grams make every
    // window's min gram-hash EQUAL, so selection runs entirely on the
    // rightmost-position tie-break (the paper's robust-winnowing rule).
    14L -> "a b c a b c a b c a b c a b c",
    // 15: BPE merge-chain depth — creation-order fragments (the/ther/
    // tion/ation/ment) plus case folding and a non-merging tail.
    15L -> "The nation stations mention internationalization and THE weather bcdfg",
    // r12 extension (r11 verdict item 7): the seams the table didn't
    // yet pin.
    // 16: synonym md5-gate edges — the gate hashes lower(token)#slot,
    // so every case variant of one synonym key must gate IDENTICALLY
    // (all replaced or all kept, per slot); punctuated keys ("small,")
    // and replacement-side words ("large") miss the table; the double
    // space pins the empty-segment round-trip of split(' ')/join(' ').
    16L -> "Big BIG bIg big small, large fast  fast slow good zz",
    // 17: BPE span-buffer growth — a word longer than the kernel's
    // 32-slot initial span buffer (34 letters) plus a long merge-dense
    // run; the per-word walk must grow its buffer, not truncate.
    17L -> ("supercalifragilisticexpialidocious " +
      "thethethethethethethethethethethethethe mentionment"),
    // r14 extension: the entity-detection kernel family (rw_entities —
    // adjacent-cap pairs, honorific/org-suffix tables, the outer-
    // punctuation strip).
    // 18: honorific periods ("Dr." strips to "dr"), a 3-token cap run
    // (Bob Stone overlaps Mr Bob), org suffixes with and without a
    // period; "Mr"/"Dr" are themselves cap tokens so they also open
    // person pairs (the reference heuristic's behavior).
    18L -> "Dr. Alice met Mr. Bob Stone at Acme Corp. and Beta LLC yesterday",
    // 19: sentence-start false positive (The Sky — flagged by design of
    // the reference heuristic), single-letter caps (I, X, Y, A, B fail
    // len>1), an all-punctuation token ("—" strips to empty and must
    // fail the cap test, not match '^[A-Z].' vacuously).
    19L -> "The Sky is blue. I Saw X Y and A. B. Cd today — Really!")

  /** tx_pattern_canary: the embedded fixture pushed through every
    * cross-engine-sensitive native kernel family on BOTH engines — a
    * per-round semantic pin for the regex chains (URL/email/IP/phone
    * application order, red_fp mask hash), the UTS #51 emoji scanner
    * vs RE2, and (since r11) the walk tokenizer's whitespace set (the
    * row-10 vertical tab found the Java-\s/RE2-\s divergence this
    * round), the langid tie-break ladder, the winnowing rightmost-min
    * tie rule, and the BPE merge chain. Corpus-independent: the sfDir
    * argument is unused, the table is the fixture itself. */
  def txPatternCanary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = withLangidCols(CanaryRows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("text"), col("lang_pred"))
    withPiiCols(docs, col("text"))
      .withColumn("n_emoji", emojiCount(col("text")).cast("long"))
      .withColumn("n_tokens", tokenCount(col("text")).cast("long"))
      .withColumn("n_winnow_fps",
        size(graft.functions.NativeExpressions.winnowFingerprints(col("text"),
          Dedup.WinnowK, Dedup.WinnowW, Dedup.WinnowPosBits)).cast("long"))
      .withColumn("n_bpe_tokens", graft.functions.NativeExpressions
        .bpeSubwordStats(col("text")).getField("n_tokens"))
      // r12: the synonym-aug kernel family (md5 gate + case fold +
      // split(' ') round-trip) at a fixed slot — row 16's edges.
      .withColumn("aug_text", graft.functions.NativeExpressions
        .synonymAug(col("text"), lit(0L), Synonyms.pairs))
      // r14: the entity-detection family (rw_entities) — cap-pair person
      // candidates, honorific/org-suffix table hits, punctuation strip.
      .transform(Entities.withEntityCols(_, col("text")))
      .select((Seq("doc_id") ++ PiiOutCols ++ Seq("n_emoji", "n_tokens",
        "lang_pred", "n_winnow_fps", "n_bpe_tokens", "aug_text",
        "n_person", "person_first", "n_honorific", "n_org", "org_first"))
        .map(col): _*)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_pattern_canary" -> (txPatternCanary _),
    "tx_tokens"       -> (txTokens _),
    "tx_bpe"          -> (txBpe _),
    "tx_bpe_train"    -> (txBpeTrain _),
    "tx_langid"       -> (txLangid _),
    "tx_quality"      -> (txQuality _),
    "tx_quality_dist" -> (txQualityDist _),
    "tx_corpus_novelty" -> (txCorpusNovelty _),
    "tx_contamination" -> (txContamination _),
    "tx_pack" -> (txPack _),
    "tx_collocations" -> (txCollocations _),
    "tx_readability"  -> (txReadability _),
    "tx_bm25"         -> (txBm25 _),
    "tx_tfidf"        -> (txTfidf _),
    "tx_fingerprint"  -> (txFingerprint _),
    "tx_heavy_hitters" -> (txHeavyHitters _),
    "tx_pii"          -> (txPii _),
    "tx_vocab_coverage" -> (txVocabCoverage _),
    "tx_chunk"        -> (txChunk _),
    "tx_boilerplate"  -> (txBoilerplate _),
    "tx_source_stats" -> (txSourceStats _))

  private[operators] val sqlTokens =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"

  val oracle: Map[String, String] = Map(
    "tx_source_stats" ->
      s"""WITH per AS (SELECT source,
         |    CAST(length($sqlTokens) AS BIGINT) AS nt,
         |    md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
         |      '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens,
         |    CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp
         |  FROM per GROUP BY source),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM s)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens * 1000000 // tt AS BIGINT) AS token_share_ppm,
         |  n_distinct_fp,
         |  CAST((n_docs - n_distinct_fp) * 1000000 // n_docs AS BIGINT) AS dup_ppm
         |FROM s, t ORDER BY source""".stripMargin,
    "tx_chunk" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |  unnest(range(0, greatest(length(toks), 1), $ChunkStride)) AS s FROM t)
         |SELECT doc_id,
         |  CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(s AS BIGINT) AS start_tok,
         |  CAST(greatest(least($ChunkTokens, length(toks) - s), 0) AS BIGINT)
         |    AS n_chunk_tokens,
         |  array_to_string(toks[s+1 : s+$ChunkTokens], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "tx_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |b AS (SELECT doc_id, CAST(s // $BoilerBlock AS BIGINT) AS bi,
         |    CAST(greatest(least($BoilerBlock, length(toks) - s), 0) AS BIGINT) AS bn,
         |    array_to_string(toks[s+1 : s+$BoilerBlock], ' ') AS bt
         |  FROM (SELECT doc_id, toks,
         |    unnest(range(0, greatest(length(toks), 1), $BoilerBlock)) AS s FROM t)),
         |h AS (SELECT bt FROM (SELECT DISTINCT doc_id, bt FROM b)
         |  GROUP BY bt HAVING CAST(count(*) AS BIGINT) >= $BoilerMinDf)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(count(h.bt) AS BIGINT) AS n_boiler,
         |  CAST(coalesce(sum(CASE WHEN h.bt IS NULL THEN bn END), 0) AS BIGINT)
         |    AS n_kept_tokens,
         |  coalesce(string_agg(CASE WHEN h.bt IS NULL THEN b.bt END, ' '
         |    ORDER BY bi), '') AS text_clean
         |FROM b LEFT JOIN h USING (bt)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "tx_bm25" -> {
      val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |d AS (SELECT doc_id, toks, CAST(length(toks) AS BIGINT) AS dl FROM t),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dl) AS BIGINT) AS a_toks FROM d),
         |p AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
         |  WHERE tok IN ($terms) GROUP BY 1, 2, 3),
         |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
         |i AS (SELECT tok,
         |  CAST(round(ln(1 + (st.n_docs - df + 0.5)/(df + 0.5)) * 1000000, 0)
         |    AS BIGINT) AS idf_ppm FROM f, st),
         |c AS (SELECT doc_id,
         |  CAST(CAST(idf_ppm AS HUGEINT) * (22 * CAST(st.a_toks AS HUGEINT) * tf)
         |    // (10 * CAST(st.a_toks AS HUGEINT) * tf
         |        + 3 * CAST(st.a_toks AS HUGEINT)
         |        + 9 * CAST(st.n_docs AS HUGEINT) * dl) AS BIGINT) AS contrib_ppm
         |  FROM p JOIN i USING (tok), st),
         |s AS (SELECT doc_id, CAST(sum(contrib_ppm) AS BIGINT) AS score_ppm,
         |  CAST(count(*) AS BIGINT) AS n_terms FROM c GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rank
         |  FROM s)
         |SELECT CAST(rank AS BIGINT) AS rank, doc_id, score_ppm, n_terms
         |FROM r WHERE rank <= $Bm25TopK ORDER BY rank""".stripMargin
    },
    "tx_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |i AS (SELECT tok,
         |  CAST(round(ln(CAST(n.n_docs AS DOUBLE) / df) * 1000000, 0) AS BIGINT)
         |    AS idf_ppm
         |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), n),
         |s AS (SELECT doc_id, tok, tf, tf * idf_ppm AS tfidf_ppm,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf * idf_ppm DESC, tok) AS rank
         |  FROM tf JOIN i USING (tok))
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, tf, tfidf_ppm
         |FROM s WHERE rank <= $TfidfTopK ORDER BY doc_id, rank""".stripMargin,
    "tx_tokens" ->
      s"""SELECT doc_id,
         |  CAST(length($sqlTokens) AS BIGINT) AS n_tokens,
         |  CAST(length(list_distinct($sqlTokens)) AS BIGINT) AS n_distinct,
         |  CAST(length(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe,
         |  CAST(length(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '')) AS BIGINT) AS n_sentences
         |FROM documents ORDER BY doc_id""".stripMargin,
    "tx_bpe" -> {
      val (nWords, nChars, nTokens) = graft.functions.Bpe.oracleExprs("text")
      s"""WITH b AS (SELECT doc_id,
         |    $nWords AS n_words,
         |    $nChars AS n_alpha_chars,
         |    $nTokens AS n_bpe_tokens
         |  FROM documents)
         |SELECT doc_id, n_words, n_alpha_chars, n_bpe_tokens,
         |  CASE WHEN n_bpe_tokens > 0
         |       THEN n_alpha_chars * 1000000 // n_bpe_tokens END AS cpt_ppm
         |FROM b ORDER BY doc_id""".stripMargin
    },
    "tx_bpe_train" ->
      graft.functions.Bpe.trainOracleSql(graft.functions.Bpe.TrainRounds),
    "tx_langid" ->
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    CAST(${sqlTokenHits(EnStops)} AS BIGINT) AS en_hits,
         |    CAST(${sqlTokenHits(EsStops)} AS BIGINT) AS es_hits,
         |    CAST(${sqlTokenHits(DeStops)} AS BIGINT) AS de_hits,
         |    CAST(${sqlTokenHits(FrStops)} AS BIGINT) AS fr_hits
         |  FROM documents)
         |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
         |  CASE
         |    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |    WHEN en_hits = 0 AND es_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'unknown'
         |    WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
         |    WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
         |    WHEN de_hits >= fr_hits THEN 'de'
         |    ELSE 'fr' END AS lang_pred
         |FROM h ORDER BY doc_id""".stripMargin,
    "tx_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length($sqlTokens) AS BIGINT) AS n_tokens,
         |    CAST(length(regexp_extract_all(text, '[,.;:!?]')) AS BIGINT) AS n_punct,
         |    CAST(${sqlTokenHits(EnStops)} AS BIGINT) AS n_stops,
         |    CAST(length(list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) != '')) AS BIGINT) AS n_lines,
         |    CAST(length(list_distinct(list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) != ''))) AS BIGINT) AS n_dlines
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |  CAST(n_punct * 1000000 // GREATEST(n_chars, 1) AS BIGINT) AS punct_ppm,
         |  CAST(n_stops * 1000000 // GREATEST(n_tokens, 1) AS BIGINT) AS stop_ppm,
         |  CAST((n_lines - n_dlines) * 1000000 // GREATEST(n_lines, 1) AS BIGINT) AS dup_line_ppm,
         |  CAST(LEAST(1000000, n_tokens * 20000) // 2
         |    + (n_stops * 1000000 // GREATEST(n_tokens, 1)) // 4
         |    + (1000000 - (n_lines - n_dlines) * 1000000 // GREATEST(n_lines, 1)) // 4 AS BIGINT) AS quality_ppm
         |FROM q ORDER BY doc_id""".stripMargin,
    "tx_quality_dist" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length($sqlTokens) AS BIGINT) AS n_tokens,
         |    CAST(length(regexp_extract_all(text, '[,.;:!?]')) AS BIGINT) AS n_punct,
         |    CAST(${sqlTokenHits(EnStops)} AS BIGINT) AS n_stops,
         |    CAST(length(list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) != '')) AS BIGINT) AS n_lines,
         |    CAST(length(list_distinct(list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) != ''))) AS BIGINT) AS n_dlines
         |  FROM documents),
         |s AS (
         |  SELECT source,
         |    CAST(LEAST(1000000, n_tokens * 20000) // 2
         |      + (n_stops * 1000000 // GREATEST(n_tokens, 1)) // 4
         |      + (1000000 - (n_lines - n_dlines) * 1000000 // GREATEST(n_lines, 1)) // 4 AS BIGINT) AS quality_ppm
         |  FROM q),
         |d AS (
         |  SELECT source, count(*) AS n_docs,
         |    quantile_cont(quality_ppm, [0.25, 0.5, 0.75, 0.95]) AS ps
         |  FROM s GROUP BY source)
         |SELECT source, n_docs,
         |  CAST(round(ps[1], 0) AS BIGINT) AS p25,
         |  CAST(round(ps[2], 0) AS BIGINT) AS p50,
         |  CAST(round(ps[3], 0) AS BIGINT) AS p75,
         |  CAST(round(ps[4], 0) AS BIGINT) AS p95
         |FROM d ORDER BY source""".stripMargin,
    "tx_corpus_novelty" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |s AS (SELECT doc_id, ${graft.functions.TextFunctions.shinglesSql("toks", 3)} AS sh FROM t),
         |posting AS (SELECT doc_id, unnest(sh) AS sg FROM s),
         |df AS (SELECT sg, count(*) AS df FROM posting GROUP BY sg)
         |SELECT p.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN df.df <= ${RareDf} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(sum(CASE WHEN df.df <= ${RareDf} THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS novelty_ppm
         |FROM posting p JOIN df USING (sg)
         |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "tx_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(length($sqlTokens) AS BIGINT) AS n_tokens FROM documents)
         |SELECT doc_id, n_tokens,
         |  CAST((CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens)
         |    // $PackBudget AS BIGINT) AS seq_id
         |FROM t ORDER BY doc_id""".stripMargin,
    "tx_contamination" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |s AS (SELECT doc_id, ${graft.functions.TextFunctions.shinglesSql("toks", ContamN)} AS sh FROM t),
         |b AS (SELECT doc_id AS bench_id, unnest(sh) AS sg FROM s WHERE doc_id % $BenchMod = 0),
         |c AS (SELECT doc_id, unnest(sh) AS sg FROM s WHERE doc_id % $BenchMod <> 0)
         |SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM c JOIN b USING (sg)
         |GROUP BY c.doc_id, b.bench_id
         |ORDER BY c.doc_id, b.bench_id""".stripMargin,
    "tx_collocations" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |uni AS (SELECT tok, count(*) AS df_tok
         |  FROM (SELECT unnest(list_distinct(toks)) AS tok FROM t) GROUP BY tok),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |bi AS (SELECT bg, count(*) AS df_ab
         |  FROM (SELECT unnest(${graft.functions.TextFunctions.shinglesSql("toks", 2)}) AS bg FROM t)
         |  GROUP BY bg HAVING count(*) >= $MinPairDf),
         |x AS (SELECT string_split(bg, ' ')[1] AS tok_a, string_split(bg, ' ')[2] AS tok_b, df_ab
         |  FROM bi WHERE contains(bg, ' '))
         |SELECT tok_a, tok_b, df_ab,
         |  CAST((df_ab * 1000000 // a.df_tok) * n_docs // b.df_tok AS BIGINT) AS lift_ppm
         |FROM x JOIN uni a ON a.tok = x.tok_a JOIN uni b ON b.tok = x.tok_b CROSS JOIN nd
         |ORDER BY lift_ppm DESC, tok_a, tok_b LIMIT 100""".stripMargin,
    "tx_readability" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(length($sqlTokens) AS BIGINT) AS n_words,
         |    CAST(length(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '')) AS BIGINT) AS n_sentences,
         |    CAST(length(regexp_extract_all(text, '\\S{7,}')) AS BIGINT) AS n_long
         |  FROM documents)
         |SELECT doc_id, n_words, n_sentences, n_long,
         |  CAST(n_words * 100 // GREATEST(n_sentences, 1)
         |    + n_long * 10000 // GREATEST(n_words, 1) AS BIGINT) AS lix_centi
         |FROM q ORDER BY doc_id""".stripMargin,
    "tx_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx_heavy_hitters" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
         |hx AS (SELECT tok, tf, i,
         |    md5('cms' || CAST(i AS VARCHAR) || '#' || tok) AS hx
         |  FROM tf CROSS JOIN (SELECT unnest([${(0 until CmsDepth).mkString(", ")}]) AS i)),
         |h AS (SELECT tok, tf, i,
         |    ${graft.functions.TextFunctions.hexLongSql("hx", 8)} % $CmsWidth AS bucket
         |  FROM hx),
         |c AS (SELECT i, bucket, CAST(sum(tf) AS BIGINT) AS cnt FROM h GROUP BY 1, 2),
         |e AS (SELECT h.tok, min(c.cnt) AS est, max(h.tf) AS exact_tf
         |  FROM h JOIN c USING (i, bucket) GROUP BY 1)
         |SELECT tok, est, exact_tf, CAST(est - exact_tf AS BIGINT) AS overcount
         |FROM e WHERE est >= $HhThreshold ORDER BY est DESC, tok""".stripMargin,
    "tx_pii" -> piiOracleSql,
    "tx_pattern_canary" ->
      piiSqlOver(canarySrcSql, withEmoji = true, canaryExtras = true),
    "tx_vocab_coverage" ->
      s"""WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
         |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
         |r AS (SELECT tok, tf,
         |    CAST(row_number() OVER (ORDER BY tf DESC, tok) AS BIGINT) AS rank,
         |    CAST(sum(tf) OVER (ORDER BY tf DESC, tok
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM tf),
         |tot AS (SELECT CAST(max(cum) AS BIGINT) AS total FROM r),
         |tg AS (SELECT unnest([${VocabTargets.mkString(", ")}]) AS target_pct)
         |SELECT CAST(target_pct AS BIGINT) AS target_pct,
         |  CAST(min(rank) AS BIGINT) AS vocab_size,
         |  CAST(min_by(cum, rank) AS BIGINT) AS covered, total
         |FROM tg CROSS JOIN tot JOIN r ON cum * 100 >= target_pct * total
         |GROUP BY target_pct, total
         |ORDER BY target_pct""".stripMargin)

  /** DuckDB mirror of [[piiProject]] over an arbitrary (doc_id, text)
    * source, generated from the same [[PiiPatterns]] (patterns use only
    * Java-regex ∩ RE2 syntax, so the single-quoted literal reads
    * identically on both engines). `withEmoji` appends the canary's
    * emoji-sequence count over the ORIGINAL text (the RE2 side of the
    * EmojiKernelSpec chain). */
  private def piiSqlOver(srcSql: String, withEmoji: Boolean,
      canaryExtras: Boolean = false): String = {
    val steps = PiiPatterns.zipWithIndex.map { case ((tag, re), i) =>
      val carry = ("doc_id" +: PiiPatterns.take(i).map(p => s"n_${p._1}"))
        .mkString(", ")
      s"""p${i + 1} AS (SELECT $carry,
         |  CAST(length(regexp_extract_all(t, '$re')) AS BIGINT) AS n_$tag,
         |  regexp_replace(t, '$re', '<${tag.toUpperCase}>', 'g') AS t FROM p$i)""".stripMargin
    }
    val counts = PiiPatterns.map(p => s"n_${p._1}")
    val emojiCol =
      if (withEmoji)
        s""",
           |  CAST(length(regexp_extract_all(c.text, '${graft.functions.TextFunctions.EmojiClass}')) AS BIGINT) AS n_emoji""".stripMargin
      else ""
    val extraCols =
      if (canaryExtras)
        s""",
           |  xh.n_tokens, xh.lang_pred, xw.n_winnow_fps, xh.n_bpe_tokens,
           |  ${Synonyms.duckAug("c.text", "0")} AS aug_text,
           |  xen.n_person, xen.person_first, xen.n_honorific, xen.n_org,
           |  xen.org_first""".stripMargin
      else ""
    val emojiJoin = if (withEmoji) " JOIN src c USING (doc_id)" else ""
    val extraJoin =
      if (canaryExtras)
        " JOIN xh USING (doc_id) JOIN xw USING (doc_id) JOIN xen USING (doc_id)"
      else ""
    val extraCtes = if (canaryExtras) canaryExtraCtes + ",\n" else ""
    s"""WITH src AS ($srcSql),
       |${extraCtes}p0 AS (SELECT doc_id, text AS t FROM src),
       |${steps.mkString(",\n")}
       |SELECT p${PiiPatterns.length}.doc_id, ${counts.mkString(", ")},
       |  CAST(${counts.mkString(" + ")} AS BIGINT) AS n_pii,
       |  CAST(length(t) AS BIGINT) AS red_chars, md5(t) AS red_fp$emojiCol$extraCols
       |FROM p${PiiPatterns.length}$emojiJoin$extraJoin ORDER BY doc_id""".stripMargin
  }

  /** The canary's non-PII kernel-family mirrors: walk tokenizer count,
    * langid decision (the tx_langid CASE verbatim), winnowing distinct
    * fingerprint count (the dd_winnow k/f formulation per-row, with
    * the short-doc guard), and the generated BPE merge chain. */
  private def canaryExtraCtes: String = {
    val k = Dedup.WinnowK
    val w = Dedup.WinnowW
    val scale = 1L << Dedup.WinnowPosBits
    val gramHash = graft.functions.TextFunctions.hexLongSql(
      s"md5(array_to_string(toks[i+1:i+$k], ' '))", 8)
    val (_, _, nBpe) = graft.functions.Bpe.oracleExprs("text")
    s"""xt AS (SELECT doc_id, text, $sqlTokens AS toks FROM src),
       |xk AS (SELECT doc_id, CASE WHEN len(toks) >= $k THEN
       |    [$gramHash * $scale + (${scale - 1} - i)
       |      FOR i IN range(0, len(toks) - $k + 1)]
       |  ELSE CAST([] AS BIGINT[]) END AS keys FROM xt),
       |xw AS (SELECT doc_id, CAST(CASE WHEN len(keys) > 0 THEN
       |    len(list_distinct([x // $scale FOR x IN
       |      [list_min(keys[s+1:s+$w])
       |        FOR s IN range(0, greatest(len(keys) - $w, 0) + 1)]]))
       |  ELSE 0 END AS BIGINT) AS n_winnow_fps FROM xk),
       |xg AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(${sqlTokenHits(EnStops)} AS BIGINT) AS en_hits,
       |    CAST(${sqlTokenHits(EsStops)} AS BIGINT) AS es_hits,
       |    CAST(${sqlTokenHits(DeStops)} AS BIGINT) AS de_hits,
       |    CAST(${sqlTokenHits(FrStops)} AS BIGINT) AS fr_hits
       |  FROM xt),
       |xh AS (SELECT doc_id, n_tokens,
       |  CASE
       |    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |    WHEN en_hits = 0 AND es_hits = 0 AND de_hits = 0 AND fr_hits = 0 THEN 'unknown'
       |    WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |    WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
       |    WHEN de_hits >= fr_hits THEN 'de'
       |    ELSE 'fr' END AS lang_pred,
       |  $nBpe AS n_bpe_tokens
       |  FROM xg),
       |xe AS (SELECT doc_id, ${Entities.sqlCleanToks("text")} AS ct FROM src),
       |xen AS (SELECT doc_id, CAST(len(persons) AS BIGINT) AS n_person,
       |    coalesce(persons[1], '') AS person_first,
       |    CAST(len(honor) AS BIGINT) AS n_honorific,
       |    CAST(len(orgs) AS BIGINT) AS n_org,
       |    coalesce(orgs[1], '') AS org_first
       |  FROM (SELECT doc_id, ${Entities.sqlCandidates("ct")} FROM xe))""".stripMargin
  }

  private def piiOracleSql: String =
    piiSqlOver("SELECT doc_id, text FROM documents", withEmoji = false)

  /** The [[CanaryRows]] fixture as a DuckDB VALUES source. */
  private def canarySrcSql: String =
    CanaryRows.map { case (id, t) =>
      s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')"
    }.mkString("SELECT * FROM (VALUES ", ", ", ") AS v(doc_id, text)")
}
