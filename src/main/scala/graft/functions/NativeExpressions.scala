package graft.functions

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path.
  *
  * Spark's higher-order functions (`transform`/`filter`/`zip_with`/
  * `aggregate`) never enter whole-stage codegen — every lambda element is
  * an interpreted round-trip, which makes per-token pipelines (shingle →
  * md5 → K minhash passes) the dominant cost of the dedup suite. Each
  * expression here collapses one such pipeline into a single tight eval
  * over the row (CodegenFallback: one interpreted call per ROW instead of
  * per token × pass).
  *
  * Value semantics are bit-identical to the Column compositions they
  * replace (and to the unchanged DuckDB oracle mirrors): the md5-prefix
  * integers are the big-endian unsigned readings of the digest bytes that
  * [[TextFunctions.hexLong]] spells out in hex.
  */
object NativeExpressions {

  private[functions] def tokenize(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** First 4 bytes of `d` at `off` as an unsigned 32-bit value — equals
    * hexLong(<hex digest>, 8) on the same region. */
  private def be32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)

  /** Distinct word n-gram shingles, first-occurrence order — the native
    * form of [[TextFunctions.shingles]] (texts shorter than n tokens fall
    * back to the whole token string). */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      val out = new mutable.LinkedHashSet[String]
      if (toks.length >= n) {
        var i = 0
        val sb = new java.lang.StringBuilder
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out += sb.toString
          i += 1
        }
      } else out += toks.mkString(" ")
      new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
    }
  }

  /** K MinHash signatures over a shingle array in one pass: per shingle
    * one md5, (a, b) = the digest's two leading big-endian uint32 halves,
    * sig_i = min over shingles of (a + i·b) mod p — the native form of the
    * transform(md5) + 2×transform(hexLong) + K×array_min(zip_with) chain. */
  case class MinHashSigs(child: Expression, k: Int, p: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sigs"
    override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
      copy(child = newChild)

    @transient private lazy val md = MessageDigest.getInstance("MD5")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sigs = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val a = be32(d, 0)
        val b = be32(d, 4)
        var s = 0
        while (s < k) {
          val h = (a + s.toLong * b) % p
          if (h < sigs(s)) sigs(s) = h
          s += 1
        }
        i += 1
      }
      new GenericArrayData(sigs)
    }
  }

  /** 32-bit SimHash over the token multiset: per token one md5 → leading
    * uint32; fingerprint bit j is set when at least half the tokens have
    * bit j set (ties and the zero-token edge set the bit, matching the
    * `cnt*2 >= n` Column form this replaces). */
  case class SimHash32(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"
    override protected def withNewChildInternal(newChild: Expression): SimHash32 =
      copy(child = newChild)

    @transient private lazy val md = MessageDigest.getInstance("MD5")

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      val cnt = new Array[Int](32)
      var i = 0
      while (i < toks.length) {
        md.reset()
        val hv = be32(md.digest(UTF8String.fromString(toks(i)).getBytes), 0)
        var j = 0
        while (j < 32) {
          if (((hv >>> j) & 1L) == 1L) cnt(j) += 1
          j += 1
        }
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < 32) {
        if (2 * cnt(j) >= toks.length) fp |= 1L << j
        j += 1
      }
      fp
    }
  }

  /** Most frequent whitespace token, ties broken by the binary (UTF-8
    * byte) ordering Spark's array_sort uses — the native form of the
    * sorted-run aggregate fold in Annotations.topicCol. Empty/blank text
    * → null. */
  case class DominantToken(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "dominant_token"
    override protected def withNewChildInternal(newChild: Expression): DominantToken =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String].toString)
      if (toks.isEmpty) return null
      val counts = new java.util.HashMap[String, Int](toks.length * 2)
      var i = 0
      while (i < toks.length) {
        counts.merge(toks(i), 1, Integer.sum _)
        i += 1
      }
      var best: UTF8String = null
      var bestN = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val u = UTF8String.fromString(e.getKey)
        if (e.getValue > bestN ||
          (e.getValue == bestN && u.compareTo(best) < 0)) {
          best = u
          bestN = e.getValue
        }
      }
      best
    }
  }

  /** Reads a numeric ArrayData as doubles (float elements cast exactly). */
  private def doubles(a: ArrayData, elem: DataType): Array[Double] = elem match {
    case DoubleType => a.toDoubleArray()
    case FloatType =>
      val out = new Array[Double](a.numElements())
      var i = 0
      while (i < out.length) { out(i) = a.getFloat(i).toDouble; i += 1 }
      out
    case other => throw new IllegalArgumentException(s"vector element type $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Cosine similarity over two equal-length numeric arrays — the native
    * form of VectorFunctions.cosine. The three accumulations run in the
    * same left-to-right IEEE order as the HOF folds (and the unrolled
    * DuckDB mirror), so values are bit-identical. Zero-norm inputs yield
    * NaN/Infinity (the HOF form would raise ANSI divide-by-zero). */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = doubles(a.asInstanceOf[ArrayData], elemType(left))
      val y = doubles(b.asInstanceOf[ArrayData], elemType(right))
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i) * y(i)
        nx += x(i) * x(i)
        ny += y(i) * y(i)
        i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
  }

  /** Squared L2 distance — native form of VectorFunctions.l2Sq, same
    * accumulation order. */
  case class L2SqDist(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "l2sq_dist"
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): L2SqDist =
      copy(left = newLeft, right = newRight)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = doubles(a.asInstanceOf[ArrayData], elemType(left))
      val y = doubles(b.asInstanceOf[ArrayData], elemType(right))
      var acc = 0.0
      var i = 0
      while (i < x.length) {
        val d = x(i) - y(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  // ---- Column wrappers ----

  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))

  def minHashSigs(c: Column, k: Int, p: Long): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(c), k, p))

  def simHash32(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))

  def dominantToken(c: Column): Column =
    ColumnBridge.column(DominantToken(ColumnBridge.expression(c)))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2SqDist(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
