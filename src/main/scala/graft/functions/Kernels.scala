package graft.functions

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels behind [[NativeExpressions]].
  *
  * Plain object methods (Scala emits static forwarders), so generated
  * whole-stage code calls them directly — no InternalRow boxing, no
  * fallback split in the codegen span. Value semantics are bit-identical
  * to the Column/HOF formulations they replace (see NativeExpressionsSpec
  * and the DuckDB oracle).
  */
object Kernels {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def tokenize(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** First 4 bytes at `off` as an unsigned 32-bit value — equals
    * hexLong(<hex digest>, 8) on the same region. */
  private def be32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text.toString)
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

  def minHashSigs(shingles: ArrayData, k: Int, p: Long): ArrayData = {
    val md = mdLocal.get()
    val sigs = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingles.numElements()) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(i).getBytes)
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

  def simHash32(text: UTF8String): Long = {
    val md = mdLocal.get()
    val toks = tokenize(text.toString)
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

  /** Most frequent token, ties by binary UTF-8 order; null for blank. */
  def dominantToken(text: UTF8String): UTF8String = {
    val toks = tokenize(text.toString)
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
      if (e.getValue > bestN || (e.getValue == bestN && u.compareTo(best) < 0)) {
        best = u
        bestN = e.getValue
      }
    }
    best
  }

  private def at(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private def sameDim(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vector dimension mismatch: ${n} vs ${b.numElements()}")
    n
  }

  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = sameDim(a, b)
    while (i < n) {
      val x = at(a, i, aFloat)
      val y = at(b, i, bFloat)
      dot += x * y
      nx += x * x
      ny += y * y
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def l2Sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    var acc = 0.0
    var i = 0
    val n = sameDim(a, b)
    while (i < n) {
      val d = at(a, i, aFloat) - at(b, i, bFloat)
      acc += d * d
      i += 1
    }
    acc
  }
}
