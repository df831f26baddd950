package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/topic/vector hot paths.
  *
  * Spark's higher-order functions (`transform`/`filter`/`zip_with`/
  * `aggregate`) never enter whole-stage codegen — every lambda element is
  * an interpreted round-trip, which made per-token pipelines (shingle →
  * md5 → K minhash passes) the dominant cost of the dedup suite. Each
  * expression here collapses one such pipeline into a single tight
  * [[Kernels]] pass, and `doGenCode` emits a direct static call so the
  * expression stays INSIDE the whole-stage codegen span (no fallback
  * boxing through InternalRow).
  *
  * Value semantics are bit-identical to the Column compositions they
  * replace (and to the unchanged DuckDB oracle mirrors): the md5-prefix
  * integers are the big-endian unsigned readings of the digest bytes that
  * [[TextFunctions.hexLong]] spells out in hex; the vector kernels run
  * the same left-to-right IEEE accumulation as the HOF folds. Asserted by
  * NativeExpressionsSpec.
  */
object NativeExpressions {

  private val K = "graft.functions.Kernels"

  // Input-type validation (AbstractDataType/TypeCollection are
  // private[sql], so these are hand-rolled checkInputDataTypes bodies
  // rather than ExpectsInputTypes mixins).

  private def expectType(
      name: String, pos: String, actual: DataType, ok: Boolean, want: String): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires $want for its $pos argument, got ${actual.catalogString}")

  private[functions] def checkString(name: String, e: Expression): TypeCheckResult =
    expectType(name, "only", e.dataType, e.dataType == StringType, "STRING")

  private[functions] def expectLong(name: String, e: Expression): TypeCheckResult =
    expectType(name, "right", e.dataType, e.dataType == LongType, "BIGINT")

  private[functions] def checkStringArray(name: String, e: Expression): TypeCheckResult =
    expectType(name, "only", e.dataType,
      e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == StringType,
      "ARRAY<STRING>")

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Both sides must be float[] or double[] — anything else (array<int>,
    * string, …) is an analysis-time failure instead of a runtime
    * ClassCastException. Equal length is asserted at runtime by
    * [[Kernels.cosine]]/[[Kernels.l2Sq]] (length is data, not schema). */
  private[functions] def checkVecVec(
      name: String, l: Expression, r: Expression): TypeCheckResult =
    if (!isVec(l.dataType))
      expectType(name, "left", l.dataType, ok = false, "ARRAY<FLOAT> or ARRAY<DOUBLE>")
    else
      expectType(name, "right", r.dataType, isVec(r.dataType), "ARRAY<FLOAT> or ARRAY<DOUBLE>")

  /** Whitespace tokens with empties dropped — the native form of
    * filter(split(c, "\\s+"), length > 0), which otherwise evaluates an
    * interpreted lambda per token in every annotation operator. */
  case class WordTokens(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_tokens"
    override protected def withNewChildInternal(newChild: Expression): WordTokens =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.wordTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordTokens($c)")
  }

  /** Count of tokens that are members of a fixed word set — the native
    * form of size(filter(toks, t ⇒ array_contains(set, t))); the word set
    * rides into generated code as a HashSet reference object. */
  case class TokenSetCount(child: Expression, words: Seq[String])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkStringArray(prettyName, child)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "token_set_count"
    override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
      copy(child = newChild)
    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }
    override def nullSafeEval(input: Any): Any =
      Kernels.tokenSetCount(input.asInstanceOf[ArrayData], set)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("words", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, c => s"$K.tokenSetCount($c, $ref)")
    }
  }

  /** Distinct word n-gram shingles, first-occurrence order — the native
    * form of [[TextFunctions.shingles]] (texts shorter than n tokens fall
    * back to the whole token string). */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.wordShingles(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordShingles($c, $n)")
  }

  /** Winnowing fingerprint selection in one pass — k-gram md5-window
    * hashes, w-wide rightmost-min windows, distinct selected hashes
    * (see Kernels.winnowFingerprints for the key algebra). */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int, posBits: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprints"
    override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w, posBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.winnowFingerprints($c, $k, $w, $posBits)")
  }

  /** K MinHash signatures over a shingle array in one pass: per shingle
    * one md5, (a, b) = the digest's two leading big-endian uint32 halves,
    * sig_i = min over shingles of (a + i·b) mod p. */
  case class MinHashSigs(child: Expression, k: Int, p: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkStringArray(prettyName, child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sigs"
    override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.minHashSigs(input.asInstanceOf[ArrayData], k, p)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.minHashSigs($c, $k, ${p}L)")
  }

  /** 32-bit SimHash over the token multiset: per token one md5 → leading
    * uint32; fingerprint bit j set when at least half the tokens have bit
    * j set (ties and the zero-token edge set the bit). */
  case class SimHash32(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"
    override protected def withNewChildInternal(newChild: Expression): SimHash32 =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.simHash32(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.simHash32($c)")
  }

  /** BPE-ish subword count — native char walk matching the greedy regex
    * scan piece-for-piece. */
  case class BpeCount(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bpe_count"
    override protected def withNewChildInternal(newChild: Expression): BpeCount =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.bpeCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.bpeCount($c)")
  }

  /** Sentence count — native form of TextFunctions' split+trim filter. */
  case class SentenceCount(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sentence_count"
    override protected def withNewChildInternal(newChild: Expression): SentenceCount =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.sentenceCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.sentenceCount($c)")
  }

  /** Emoji sequence count — native form of
    * regexp_count(c, TextFunctions.EmojiClass) (see Kernels.emojiCount
    * for why the big alternation can't ride Java's backtracking
    * engine). */
  case class EmojiCount(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "emoji_count"
    override protected def withNewChildInternal(newChild: Expression): EmojiCount =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.emojiCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.emojiCount($c)")
  }

  /** Normalized md5 fingerprint — fused native form of the
    * lower → strip → collapse → md5 chain. */
  case class Fingerprint(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = StringType
    override def prettyName: String = "fingerprint"
    override protected def withNewChildInternal(newChild: Expression): Fingerprint =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.fingerprint(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.fingerprint($c)")
  }

  /** Most frequent whitespace token, ties broken by binary UTF-8 order
    * (the order Spark's array_sort uses). Blank text → null. */
  case class DominantToken(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "dominant_token"
    override protected def withNewChildInternal(newChild: Expression): DominantToken =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.dominantToken(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $K.dominantToken($c);
        ${ev.isNull} = (${ev.value} == null);""")
  }

  /** Schema of [[BpeSubwordStats]] — see [[Kernels.bpeSubwordStats]]. */
  val bpeStatsType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  /** Merge-table BPE subword stats in one text pass — the embedded
    * [[Bpe.Merges]] table applied in rank order (see [[Bpe]] for the
    * engine-mirroring contract). */
  case class BpeSubwordStats(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = bpeStatsType
    override def prettyName: String = "bpe_subword_stats"
    override protected def withNewChildInternal(newChild: Expression): BpeSubwordStats =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.bpeSubwordStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.bpeSubwordStats($c)")
  }

  /** Schema of [[RewardStats]] — see [[Kernels.rewardStats]] for field
    * semantics. */
  val rewardStatsType: StructType = StructType(Seq(
    StructField("awords_total", IntegerType, nullable = false),
    StructField("awords_distinct", IntegerType, nullable = false),
    StructField("sent_n", IntegerType, nullable = false),
    StructField("sent_sum", LongType, nullable = false),
    StructField("sent_sumsq", LongType, nullable = false),
    StructField("sim_avg_ppm", LongType, nullable = false),
    StructField("arc", IntegerType, nullable = false),
    StructField("flow_transitions", IntegerType, nullable = false),
    StructField("bullet_any", BooleanType, nullable = false),
    StructField("div_dash", IntegerType, nullable = false),
    StructField("div_eq", IntegerType, nullable = false),
    StructField("div_star", IntegerType, nullable = false),
    StructField("div_tilde", IntegerType, nullable = false),
    StructField("emo_total", IntegerType, nullable = false),
    StructField("emo_distinct", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("tail_hashtags", IntegerType, nullable = false),
    StructField("n_period", LongType, nullable = false),
    StructField("n_comma", LongType, nullable = false),
    StructField("n_exclaim", LongType, nullable = false),
    StructField("n_question", LongType, nullable = false),
    StructField("n_semicolon", LongType, nullable = false),
    StructField("score_sum", LongType, nullable = false),
    StructField("n_empty", IntegerType, nullable = false),
    StructField("n_num", IntegerType, nullable = false),
    StructField("n_let_plus", IntegerType, nullable = false),
    StructField("n_sym", IntegerType, nullable = false),
    StructField("tok_total", IntegerType, nullable = false),
    StructField("tok_distinct", IntegerType, nullable = false)))

  /** Every reward-suite per-row statistic in one text pass — replaces a
    * dozen interpreted HOF lambda chains (vocab distinct ratio, sentence
    * moments, paragraph Jaccard, bullet/divider line scans, emoji
    * variety) with a single [[Kernels.rewardStats]] call. Downstream
    * GetStructField references share one evaluation via whole-stage
    * codegen subexpression elimination. */
  case class RewardStats(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = rewardStatsType
    override def prettyName: String = "reward_stats"
    override protected def withNewChildInternal(newChild: Expression): RewardStats =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.rewardStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.rewardStats($c)")
  }

  /** Schema of [[EntityStats]] — see [[Kernels.entityStats]]. */
  val entityStatsType: StructType = StructType(Seq(
    StructField("n_person", LongType, nullable = false),
    StructField("person_first", StringType, nullable = false),
    StructField("injected_name", StringType, nullable = false),
    StructField("n_honorific", LongType, nullable = false),
    StructField("honorific_first", StringType, nullable = false),
    StructField("n_org", LongType, nullable = false),
    StructField("org_first", StringType, nullable = false)))

  /** Entity-candidate detection in one text pass — replaces the
    * rw_entities interpreted HOF pipeline (three filtered adjacent-pair
    * comprehensions with a per-token rlike) with a single
    * [[Kernels.entityStats]] walk. The three lookup tables ride along as
    * codegen reference objects; downstream GetStructField references
    * share one evaluation via subexpression elimination. */
  case class EntityStats(child: Expression, honorifics: Seq[String],
      orgSuffixes: Seq[String], namePool: Seq[String])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = entityStatsType
    override def prettyName: String = "entity_stats"
    override protected def withNewChildInternal(newChild: Expression): EntityStats =
      copy(child = newChild)
    @transient private lazy val honorSet = toSet(honorifics)
    @transient private lazy val orgSet = toSet(orgSuffixes)
    @transient private lazy val nameSet = toSet(namePool)
    private def toSet(xs: Seq[String]): java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      xs.foreach(s.add)
      s
    }
    override def nullSafeEval(input: Any): Any =
      Kernels.entityStats(input.asInstanceOf[UTF8String], honorSet, orgSet, nameSet)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val h = ctx.addReferenceObj("honorifics", honorSet, "java.util.HashSet")
      val o = ctx.addReferenceObj("orgSuffixes", orgSet, "java.util.HashSet")
      val p = ctx.addReferenceObj("namePool", nameSet, "java.util.HashSet")
      defineCodeGen(ctx, ev, c => s"$K.entityStats($c, $h, $o, $p)")
    }
  }

  /** ALL word n-gram occurrences (not distinct — [[WordShingles]] is the
    * distinct form) — see [[Kernels.wordNgrams]]. */
  case class WordNgrams(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_ngrams"
    override protected def withNewChildInternal(newChild: Expression): WordNgrams =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.wordNgrams(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordNgrams($c, $n)")
  }

  /** Intra-doc n-gram repetition stats — see [[Kernels.ngramRepetition]].
    * Struct fields: total / top / dup n-gram occurrence counts. */
  case class NgramRepetition(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkString(prettyName, child)
    override def dataType: DataType = StructType(Seq(
      StructField("total", LongType, nullable = false),
      StructField("top", LongType, nullable = false),
      StructField("dup", LongType, nullable = false)))
    override def prettyName: String = "ngram_repetition"
    override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any =
      Kernels.ngramRepetition(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.ngramRepetition($c, $n)")
  }

  private def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(s"vector element type $other")
    }

  /** Positionwise equal-element count of two BIGINT signature arrays —
    * see [[Kernels.sigMatches]]. Equal length is asserted at runtime
    * (length is data, not schema). */
  case class SigMatches(left: Expression, right: Expression)
      extends BinaryExpression {
    private def isLongArr(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (!isLongArr(left.dataType))
        NativeExpressions.expectType(prettyName, "left", left.dataType,
          ok = false, "ARRAY<BIGINT>")
      else
        NativeExpressions.expectType(prettyName, "right", right.dataType,
          isLongArr(right.dataType), "ARRAY<BIGINT>")
    override def dataType: DataType = LongType
    override def prettyName: String = "sig_matches"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SigMatches =
      copy(left = newLeft, right = newRight)
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sigMatches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.sigMatches($a, $b)")
  }

  /** Cosine similarity over two equal-length numeric arrays — the native
    * form of VectorFunctions.cosine; same left-to-right IEEE order as the
    * HOF folds and the unrolled DuckDB mirror, so values are
    * bit-identical. Zero-norm inputs yield NaN/Infinity (the HOF form
    * would raise ANSI divide-by-zero). */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkVecVec(prettyName, left, right)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"$K.cosine($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  }

  /** Per-cluster SemDeDup verdicts — see [[Kernels.semanticVerdicts]]:
    * ARRAY<STRUCT<vec_id, v>> → ARRAY<STRUCT<vec_id, n_dups,
    * min_other>>, the dd_semantic within-cluster pair scan as one
    * native pass over the collected members (no pair self-join). */
  case class SemanticVerdicts(child: Expression, minCosX1e6: Double)
      extends UnaryExpression {
    private def isVecStructArr(t: DataType): Boolean = t match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && (f1.dataType match {
          case ArrayType(FloatType | DoubleType, _) => true
          case _ => false
        })
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      expectType(prettyName, "only", child.dataType,
        isVecStructArr(child.dataType),
        "ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>>")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("n_dups", LongType, nullable = false),
      StructField("min_other", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "semantic_verdicts"
    override protected def withNewChildInternal(newChild: Expression): SemanticVerdicts =
      copy(child = newChild)
    private def vFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fields(1).dataType
        .asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(input: Any): Any =
      Kernels.semanticVerdicts(input.asInstanceOf[ArrayData], minCosX1e6, vFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.semanticVerdicts($c, $minCosX1e6, $vFloat)")
  }

  /** Per-cluster exact top-k neighbors for the knn-graph build — see
    * [[Kernels.knnTopK]]. (qv, q_id, members) → the k best (vec_id, cos)
    * structs by (cos desc, vec_id asc), self excluded. */
  case class KnnTopK(first: Expression, second: Expression, third: Expression, k: Int)
      extends TernaryExpression {
    private def isVecStructArr(t: DataType): Boolean = t match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && (f1.dataType match {
          case ArrayType(FloatType | DoubleType, _) => true
          case _ => false
        })
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val okFirst = first.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (!okFirst)
        expectType(prettyName, "first", first.dataType, ok = false,
          "ARRAY<FLOAT> or ARRAY<DOUBLE>")
      else if (second.dataType != LongType)
        expectType(prettyName, "second", second.dataType, ok = false, "BIGINT")
      else
        expectType(prettyName, "third", third.dataType,
          isVecStructArr(third.dataType),
          "ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>>")
    }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "knn_top_k"
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): KnnTopK =
      copy(first = newFirst, second = newSecond, third = newThird)
    private def qFloat: Boolean =
      first.dataType.asInstanceOf[ArrayType].elementType == FloatType
    private def mFloat: Boolean =
      third.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fields(1).dataType
        .asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(qv: Any, qid: Any, members: Any): Any =
      Kernels.knnTopK(qv.asInstanceOf[ArrayData], qid.asInstanceOf[Long],
        members.asInstanceOf[ArrayData], k, qFloat, mFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"$K.knnTopK($a, $b, $c, $k, $qFloat, $mFloat)")
  }

  /** int8 scalar-quantized dot product — see [[Kernels.sq8Dot]]. Exact
    * integer result (LONG), so downstream ranking/hashing is
    * order-insensitive. */
  case class Sq8Dot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkVecVec(prettyName, left, right)
    override def dataType: DataType = LongType
    override def prettyName: String = "sq8_dot"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Sq8Dot =
      copy(left = newLeft, right = newRight)
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.sq8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"$K.sq8Dot($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  }

  /** Squared L2 distance — native form of VectorFunctions.l2Sq, same
    * accumulation order. */
  case class L2SqDist(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkVecVec(prettyName, left, right)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "l2sq_dist"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): L2SqDist =
      copy(left = newLeft, right = newRight)
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"$K.l2Sq($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  }

  /** Nearest centroid (squared-L2 argmin) over an array<struct<c_id,cv>>
    * column — replaces an interpreted per-centroid HOF fold; with ~800
    * centroids at scale that fold was the dominant cost of cluster
    * assignment and IVF probing. */
  case class ArgminL2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val leftOk = NativeExpressions.checkVecVec(prettyName, left, left)
      if (leftOk.isFailure) return leftOk
      right.dataType match {
        case ArrayType(StructType(Array(f0, f1)), _)
          if f0.dataType == LongType &&
            (f1.dataType match {
              case ArrayType(FloatType | DoubleType, _) => true
              case _ => false
            }) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>> " +
            s"for its right argument, got ${other.catalogString}")
      }
    }
    override def dataType: DataType = StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("c_id", LongType, nullable = false)))
    override def nullable: Boolean = true // empty centroid array
    override def prettyName: String = "argmin_l2"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArgminL2 =
      copy(left = newLeft, right = newRight)
    private def cvFloat: Boolean =
      right.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fields(1).dataType
        .asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.argminL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), cvFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = $K.argminL2($a, $b, ${isFloatArr(left)}, $cvFloat);
        ${ev.isNull} = (${ev.value} == null);""")
  }

  /** [[ArgminL2]]'s top-2 form: (d, c_id, d2) — nearest distance/id plus
    * the second-nearest distance, one O(k) pass ([[Kernels.argmin2L2]]);
    * the simplified-silhouette operator's kernel. */
  case class Argmin2L2(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val leftOk = NativeExpressions.checkVecVec(prettyName, left, left)
      if (leftOk.isFailure) return leftOk
      right.dataType match {
        case ArrayType(StructType(Array(f0, f1)), _)
          if f0.dataType == LongType &&
            (f1.dataType match {
              case ArrayType(FloatType | DoubleType, _) => true
              case _ => false
            }) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>> " +
            s"for its right argument, got ${other.catalogString}")
      }
    }
    override def dataType: DataType = StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("c_id", LongType, nullable = false),
      StructField("d2", DoubleType, nullable = false)))
    override def nullable: Boolean = true // empty centroid array
    override def prettyName: String = "argmin2_l2"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Argmin2L2 =
      copy(left = newLeft, right = newRight)
    private def cvFloat: Boolean =
      right.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fields(1).dataType
        .asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.argmin2L2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isFloatArr(left), cvFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        ${ev.value} = $K.argmin2L2($a, $b, ${isFloatArr(left)}, $cvFloat);
        ${ev.isNull} = (${ev.value} == null);""")
  }

  /** Sign-LSH bucket over a float/double vector for a fixed ±1 hyperplane
    * matrix (carried into generated code as a plan reference object). */
  case class SignLshBucket(child: Expression, planes: Seq[Seq[Double]])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      NativeExpressions.checkVecVec(prettyName, child, child)
    override def dataType: DataType = LongType
    override def prettyName: String = "sign_lsh_bucket"
    override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
      copy(child = newChild)
    @transient private lazy val matrix: Array[Array[Double]] =
      planes.map(_.toArray).toArray
    override def nullSafeEval(input: Any): Any =
      Kernels.signLshBucket(input.asInstanceOf[ArrayData], matrix, isFloatArr(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", matrix, "double[][]")
      defineCodeGen(ctx, ev, c => s"$K.signLshBucket($c, $ref, ${isFloatArr(child)})")
    }
  }

  /** The n nearest centroid ids by (L2², c_id) — the native form of the
    * probe-expansion `slice(array_sort(transform(cents, …)), 1, n)` chain
    * projected to c_ids. See [[Kernels.topNCentroidIds]]; ordering
    * (including the NaN-after-finite, ties-to-ascending-id rule) is
    * bit-identical to array_sort on struct(double, bigint), pinned by
    * NativeExpressionsSpec's differential. */
  case class TopNCentroidIds(left: Expression, right: Expression, n: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      if (n < 1) return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n >= 1, got $n")
      val leftOk = NativeExpressions.checkVecVec(prettyName, left, left)
      if (leftOk.isFailure) return leftOk
      right.dataType match {
        case ArrayType(StructType(Array(f0, f1)), _)
          if f0.dataType == LongType &&
            (f1.dataType match {
              case ArrayType(FloatType | DoubleType, _) => true
              case _ => false
            }) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>> " +
            s"for its right argument, got ${other.catalogString}")
      }
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "top_n_centroid_ids"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopNCentroidIds =
      copy(left = newLeft, right = newRight)
    private def cvFloat: Boolean =
      right.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fields(1).dataType
        .asInstanceOf[ArrayType].elementType == FloatType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.topNCentroidIds(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        n, isFloatArr(left), cvFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"$K.topNCentroidIds($a, $b, $n, ${isFloatArr(left)}, $cvFloat)")
  }

  /** Deterministic synonym augmentation — the native form of
    * [[graft.operators.Synonyms]].sparkAug's split → per-token
    * md5-gate + 60-branch CaseWhen lookup → array_join HOF chain,
    * collapsed to one [[Kernels.synonymAug]] byte walk. The HOF form
    * interpreted the whole lambda per token (md5 + a linear CaseWhen
    * scan), which put p05_upsample's cold pass at 72 s vs ~3 s warm;
    * the kernel stays inside whole-stage codegen and hashes against a
    * HashMap instead. The table rides in as a reference object, so the
    * generated source is table-size-independent. */
  case class SynonymAug(left: Expression, right: Expression, pairs: Seq[(String, String)])
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = NativeExpressions.checkString(prettyName, left)
      if (l.isFailure) return l
      NativeExpressions.expectLong(prettyName, right)
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "synonym_aug"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SynonymAug =
      copy(left = newLeft, right = newRight)
    @transient private lazy val map: java.util.HashMap[String, String] = {
      val m = new java.util.HashMap[String, String]()
      pairs.foreach { case (a, b) => m.put(a, b) }
      m
    }
    override def nullSafeEval(text: Any, slot: Any): Any =
      Kernels.synonymAug(
        text.asInstanceOf[UTF8String], slot.asInstanceOf[Long], map)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("synonyms", map, "java.util.HashMap")
      defineCodeGen(ctx, ev, (t, s) => s"$K.synonymAug($t, $s, $ref)")
    }
  }

  // ---- Column wrappers ----

  def wordTokens(c: Column): Column =
    ColumnBridge.column(WordTokens(ColumnBridge.expression(c)))

  def tokenSetCount(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetCount(ColumnBridge.expression(toks), words))

  def sentenceCount(c: Column): Column =
    ColumnBridge.column(SentenceCount(ColumnBridge.expression(c)))

  def bpeCount(c: Column): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(c)))

  def bpeSubwordStats(c: Column): Column =
    ColumnBridge.column(BpeSubwordStats(ColumnBridge.expression(c)))

  def emojiCount(c: Column): Column =
    ColumnBridge.column(EmojiCount(ColumnBridge.expression(c)))

  def fingerprint(c: Column): Column =
    ColumnBridge.column(Fingerprint(ColumnBridge.expression(c)))

  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))

  def minHashSigs(c: Column, k: Int, p: Long): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(c), k, p))

  def winnowFingerprints(c: Column, k: Int, w: Int, posBits: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w, posBits))

  def simHash32(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))

  def dominantToken(c: Column): Column =
    ColumnBridge.column(DominantToken(ColumnBridge.expression(c)))

  def rewardStats(c: Column): Column =
    ColumnBridge.column(RewardStats(ColumnBridge.expression(c)))

  def entityStats(c: Column, honorifics: Seq[String], orgSuffixes: Seq[String],
      namePool: Seq[String]): Column =
    ColumnBridge.column(EntityStats(
      ColumnBridge.expression(c), honorifics, orgSuffixes, namePool))

  def argminL2(v: Column, cents: Column): Column =
    ColumnBridge.column(ArgminL2(ColumnBridge.expression(v), ColumnBridge.expression(cents)))

  def argmin2L2(v: Column, cents: Column): Column =
    ColumnBridge.column(Argmin2L2(ColumnBridge.expression(v), ColumnBridge.expression(cents)))

  def signLshBucket(c: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(SignLshBucket(ColumnBridge.expression(c), planes))

  def topNCentroidIds(v: Column, cents: Column, n: Int): Column =
    ColumnBridge.column(TopNCentroidIds(
      ColumnBridge.expression(v), ColumnBridge.expression(cents), n))

  def synonymAug(text: Column, slot: Column, pairs: Seq[(String, String)]): Column =
    ColumnBridge.column(SynonymAug(
      ColumnBridge.expression(text), ColumnBridge.expression(slot), pairs))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sigMatches(a: Column, b: Column): Column =
    ColumnBridge.column(SigMatches(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2SqDist(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sq8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Sq8Dot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def semanticVerdicts(members: Column, minCosX1e6: Double): Column =
    ColumnBridge.column(SemanticVerdicts(ColumnBridge.expression(members), minCosX1e6))

  def knnTopK(qv: Column, qId: Column, members: Column, k: Int): Column =
    ColumnBridge.column(KnnTopK(ColumnBridge.expression(qv),
      ColumnBridge.expression(qId), ColumnBridge.expression(members), k))

  def ngramRepetition(c: Column, n: Int): Column =
    ColumnBridge.column(NgramRepetition(ColumnBridge.expression(c), n))

  def wordNgrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
}
