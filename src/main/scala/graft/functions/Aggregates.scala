package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst aggregate functions.
  *
  * [[CollectBounded]] is the skew-proof replacement for the
  * "df-cap-then-collect_list" posting-list pattern: a plain
  * `collect_list` (or a count window feeding a filter) must buffer EVERY
  * posting of a key before the cap can discard it, so one boilerplate
  * shingle appearing in 10⁹ documents concentrates 10⁹ rows of state in a
  * single task. CollectBounded keeps at most `maxSize + 1` elements per
  * aggregation buffer — in the map-side partial aggregate, in shuffle
  * spill, and in the final merge — and evaluates to NULL once a key
  * overflows the cap. Hot keys therefore cost O(maxSize) everywhere and
  * are dropped by a null filter, which is exactly the stop-key semantics
  * the cap expresses. Output order is unspecified (merge order is
  * nondeterministic); callers needing determinism sort the result array.
  */
case class CollectBounded(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  def this(child: Expression, maxSize: Int) = this(child, maxSize, 0, 0)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (maxSize > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"collect_bounded requires a positive maxSize, got $maxSize")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  // Buffers grow to maxSize + 1 and stop: one extra element distinguishes
  // "exactly maxSize" from "overflowed" without counting further.
  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length <= maxSize) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (i < other.length && buf.length <= maxSize) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    if (buf.length > maxSize) null else new GenericArrayData(buf.toArray)

  // One compiled projection per operator instance, not per buffer —
  // UnsafeProjection.create codegen-compiles, which would otherwise run
  // once per serialized key.
  @transient private lazy val bufProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    bufProjection.apply(InternalRow(new GenericArrayData(obj.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => buf += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectBounded =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectBounded =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectBounded =
    copy(child = newChild)
  override def prettyName: String = "collect_bounded"
}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002):
  * keep the k smallest DISTINCT hash values seen; with the hashes uniform
  * on [0, 2³²), n distinct values push the kth-smallest down to ≈ k·2³²/n,
  * so n̂ = (k−1)·2³² / h₍ₖ₎ (the unbiased form), exact below k. The state
  * is ≤ k longs per group REGARDLESS of input cardinality — the property
  * that replaces a 100 TB distinct-shuffle with a map-side-combinable
  * k-long buffer. Unlike HLL unions or sampling, "k smallest of a union"
  * is commutative and associative, so the result is independent of
  * partitioning and merge order — which is what lets the DuckDB oracle
  * reproduce it bit-for-bit from a window over the same md5-derived
  * hashes (relative error ~1/√k comes from the hash, not the engine).
  * Input must already be the 32-bit-space hash (BIGINT): hashing stays in
  * codegen'd builtins; the sketch only maintains order statistics.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  def this(child: Expression, k: Int) = this(child, k, 0, 0)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2) TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires k >= 2, got $k")
    else if (child.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a BIGINT hash input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  // TreeSet.add dedups; pollLast trims back to k. Values above the current
  // kth-smallest can never enter the final k, so they're dropped unseen.
  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** 2³² — the hash space the md5-hex-window hashes are uniform on. */
  private val HashSpace = 1L << 32

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    // h₍ₖ₎ = 0 needs every kept hash to be 0 — impossible for k ≥ 2
    // distinct values; the guard mirrors the oracle's greatest(hk, 1).
    else (k - 1).toLong * HashSpace / math.max(buf.last, 1L)

  override def serialize(obj: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * obj.size)
    val it = obj.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct"
}

/** One-pass integer Gram accumulator for the deterministic PCA fit: over
  * quantized vectors q (ARRAY<BIGINT>, micro-fixed-point), accumulates
  * the flat buffer [n, s₀..s_{D−1}, p₀₀..p_{DD−1}] with sᵢ = Σqᵢ and
  * pᵢⱼ = Σqᵢqⱼ — the exact BIGINT sums the covariance is built from.
  *
  * This replaces pcaDetFit's original posexplode shape, which expanded
  * every row to D+D² = 4160 (k, x) rows through two nested interpreted
  * `transform` lambdas before a groupBy(k) — 166M exploded rows at 20×
  * density (35 s). Here the D² products are computed in a tight JVM loop
  * and folded into ONE (1+D+D²)-long buffer per aggregation state:
  * map-side partials carry a single 33 KB buffer per partition, the
  * shuffle moves partitions×1 rows, and nothing is exploded. Addition of
  * longs is associative/commutative, so the sums are bit-equal to the
  * exploded form's BIGINT sums regardless of partitioning — the DuckDB
  * oracle mirror is untouched. */
case class GramSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  def this(child: Expression, dim: Int) = this(child, dim, 0, 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (dim < 1) TypeCheckResult.TypeCheckFailure(
      s"gram_sum requires dim >= 1, got $dim")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_sum requires ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val q = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(q.numElements() == dim,
        s"gram_sum: vector dimension ${q.numElements()} != $dim")
      buf(0) += 1
      var i = 0
      while (i < dim) {
        val qi = q.getLong(i)
        buf(1 + i) += qi
        val rowOff = 1 + dim + i * dim
        var j = 0
        while (j < dim) { buf(rowOff + j) += qi * q.getLong(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(obj: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * obj.length)
    var i = 0
    while (i < obj.length) { bb.putLong(obj(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSum =
    copy(child = newChild)
  override def prettyName: String = "gram_sum"
}

object Aggregates {

  /** collect_list capped at `maxSize` elements of per-key state; NULL for
    * keys whose group exceeds the cap. See [[CollectBounded]]. */
  def collectBounded(c: Column, maxSize: Int): Column =
    ColumnBridge.column(
      CollectBounded(ColumnBridge.expression(c), maxSize).toAggregateExpression())

  /** Flat [n, s(dim), p(dim×dim)] integer Gram sums over a quantized
    * ARRAY<BIGINT> vector column. See [[GramSum]]. */
  def gramSum(c: Column, dim: Int): Column =
    ColumnBridge.column(
      GramSum(ColumnBridge.expression(c), dim).toAggregateExpression())

  /** KMV distinct-count estimate over a BIGINT hash column uniform on
    * [0, 2³²); exact below k, (k−1)·2³²/h₍ₖ₎ at or above. See
    * [[KmvDistinct]]. */
  def kmvDistinct(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(c), k).toAggregateExpression())

  /** THE [[kmvDistinct]] input hash: salted md5 hex window → uniform
    * BIGINT on [0, 2³²). Single definition shared by the batch operator,
    * the streaming mirror, and their specs — the salt ("kmv#") and the
    * 8-hex-digit width are load-bearing (the DuckDB oracle in
    * SparkEntry mirrors both), so a change that reached only one copy
    * would silently break the batch/streaming/oracle equalities. NULL
    * inputs hash to NULL (concat propagates) and [[KmvDistinct]] skips
    * them; the oracle filters its NULL hashes to match. */
  def kmvHash(c: Column): Column = {
    import org.apache.spark.sql.functions.{concat, conv, lit, md5, substring}
    conv(substring(md5(concat(lit("kmv#"), c.cast("string"))), 1, 8), 16, 10)
      .cast("long")
  }

  /** Materialize a Bloom filter over a BIGINT column as serialized bytes
    * (Spark's runtime-filter sketch, `org.apache.spark.util.sketch
    * .BloomFilter`). The result is bounded by `numBits` (≤ ~1 MiB at the
    * defaults) regardless of input cardinality — the property that lets a
    * candidate-id filter ship to every task where an exact id set could
    * not. This is a driver-side action, the same shape as the evaluated
    * scalar subquery Spark's own InjectRuntimeFilter produces. */
  def bloomFilterBytes(
      df: org.apache.spark.sql.DataFrame, colName: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, expectedItems, numBits)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** might_contain(<inlined bloom>, value): false ⇒ definitely absent
    * (safe to prune); true may be a false positive, so exact predicates
    * must still run downstream. Codegen'd — the deserialized sketch is
    * cached once per task via the expression's lazy state. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), ColumnBridge.expression(value)))
  }
}
