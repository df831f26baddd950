package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
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

  /** The ENGINE-SHARED whitespace set [ \t\n\f\r] — RE2's `\s`, which
    * is what every DuckDB oracle mirror written as `\s` actually reads.
    * Java's `\s` additionally contains \x0B (vertical tab); the r11
    * canary extension surfaced that as a latent cross-engine divergence
    * in every tokenizer-derived oracle, so the kernels standardize on
    * the shared set (the tx_pii "Java∩RE2" principle applied to
    * whitespace). A \x0B therefore stays INSIDE a token on both
    * engines — pinned by TokenizeWalkSpec and the tx_pattern_canary
    * rows. */
  // Range-check form, not a 5-way chain: the common case (a letter)
  // must exit in the same 3 compares as the pre-r11 [\t..\r] range —
  // the chain form measured dd_winnow 2.1x slower at sf0.1 (the ws
  // test is the innermost branch of every tokenizer walk). Only actual
  // control-range whitespace pays the \x0B exclusion.
  @inline private def isWsChar(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r' && c != 0x0B)

  /** Manual walk equal to s.split("[ \t\n\f\r]+").filter(_.nonEmpty):
    * maximal runs of non-whitespace chars ([[isWsChar]] — the
    * engine-shared set). The regex split paid engine dispatch per
    * boundary plus the empty-first-element rescan; the walk is a single
    * char loop (same output on every input — TokenizeWalkSpec fuzzes
    * the equivalence). */
  def tokenize(s: String): Array[String] = {
    val n = s.length
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < n) {
      while (i < n && isWsChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWsChar(s.charAt(i))) i += 1
      if (i > start) out.add(s.substring(start, i))
    }
    out.toArray(new Array[String](out.size()))
  }

  /** Whitespace tokens as an ArrayData (the native form of
    * filter(split(c, "\\s+"), nonEmpty) — one pass, no per-token lambda
    * round-trips). Walks BYTES: the six \s chars are single-byte ASCII
    * and UTF-8 multibyte sequences never contain ASCII bytes, so the
    * byte walk splits exactly where the char walk does and each token is
    * a byte-slice — no String round-trip, no char decode. */
  def wordTokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(bytes(i))) i += 1
      val start = i
      while (i < n && !isWsByte(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  // Same range-check shape as isWsChar (letters and UTF-8 lead/
  // continuation bytes — negative as Java signed bytes — exit in 3
  // compares; see the isWsChar perf note).
  @inline private def isWsByte(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D && b != 0x0B)

  /** BPE-ish subword count — the native form of
    * regexp_count(c, "[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"): a greedy
    * regex scan emits ceil(L/4) pieces per alphanumeric run of length L
    * plus one piece per other non-whitespace code point, so a single
    * char walk reproduces the match count exactly. Whitespace = Java
    * regex \s (ASCII). */
  def bpeCount(text: UTF8String): Int = {
    val s = text.toString
    var n = 0
    var run = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i) // one regex match per code point, not char
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      if (alnum) run += 1
      else {
        n += (run + 3) / 4
        run = 0
        // engine-shared whitespace set (see isWsChar): NOT \x0B
        val ws = cp == ' ' || (cp >= '\t' && cp <= '\r' && cp != 0x0B)
        if (!ws) n += 1
      }
      i += Character.charCount(cp)
    }
    n + (run + 3) / 4
  }

  /** Sentences: "[.!?]+"-split parts that are non-blank after space-trim
    * (the native form of TextFunctions.sentenceCount). */
  def sentenceCount(text: UTF8String): Int =
    text.toString.split("[.!?]+", -1).count(x => trimSpaces(x).nonEmpty)

  // ---- UTS #51 emoji-sequence scanner ------------------------------
  // The native form of regexp_count(text, TextFunctions.EmojiClass):
  // Java's backtracking engine pays heavily for the big pictographic
  // alternation (p02_label measured 0.5 → 3.3 s at sf0.1 when the
  // sequence grammar replaced the flat block-class), where this is one
  // leftmost code-point walk. Semantics are match-for-match identical
  // to the regex (EmojiKernelSpec differential): at each position try
  // keycap, then flag pair, then pictographic chain; on failure advance
  // one code point (a match can only start on a class member, so the
  // regex's per-char scan visits the same start set).

  private val pictStarts: Array[Int] =
    TextFunctions.PictographicRanges.map(_._1).toArray
  private val pictEnds: Array[Int] =
    TextFunctions.PictographicRanges.map(_._2).toArray

  private def isPict(c: Int): Boolean = {
    var lo = 0
    var hi = pictStarts.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (c < pictStarts(mid)) hi = mid - 1
      else if (c > pictEnds(mid)) lo = mid + 1
      else return true
    }
    false
  }

  private def isRegionalIndicator(c: Int): Boolean =
    c >= 0x1F1E6 && c <= 0x1F1FF

  /** One optional presentation selector per pictograph:
    * (?:FE0F|[1F3FB-1F3FF])? — at most ONE of either. */
  private def skipSelector(s: String, i: Int): Int =
    if (i < s.length) {
      val c = s.codePointAt(i)
      if (c == 0xFE0F || (c >= 0x1F3FB && c <= 0x1F3FF)) i + Character.charCount(c)
      else i
    } else i

  /** The scan core: walks `s` leftmost, invokes `onMatch(start, end)`
    * (char offsets) per emoji sequence, returns the match count. Shared
    * by [[emojiCount]] (count only) and [[rewardStats]] (which also
    * needs the matched substrings for the variety ratio). */
  private def scanEmoji(s: String, onMatch: (Int, Int) => Unit): Int = {
    val len = s.length
    var i = 0
    var n = 0
    while (i < len) {
      val c = s.codePointAt(i)
      val cw = Character.charCount(c)
      if (c == '#' || c == '*' || (c >= '0' && c <= '9')) {
        // keycap: [#*0-9] FE0F? 20E3
        var j = i + cw
        if (j < len && s.codePointAt(j) == 0xFE0F) j += 1
        if (j < len && s.codePointAt(j) == 0x20E3) {
          n += 1; onMatch(i, j + 1); i = j + 1
        } else i += cw
      } else if (isRegionalIndicator(c) && i + cw < len &&
          isRegionalIndicator(s.codePointAt(i + cw))) {
        // flag: exactly two regional indicators
        val end = i + cw + Character.charCount(s.codePointAt(i + cw))
        n += 1; onMatch(i, end); i = end
      } else if (isPict(c)) {
        // pictographic chain: PICT sel? (ZWJ PICT sel?)* — an unpaired
        // regional indicator lands here too (RI ⊂ the 1F000-1FAFF
        // range), exactly like the regex's third alternative
        var j = skipSelector(s, i + cw)
        var more = true
        while (more) {
          more = false
          if (j < len && s.codePointAt(j) == 0x200D && j + 1 < len) {
            val next = s.codePointAt(j + 1)
            if (isPict(next)) {
              // the ZWJ is consumed only when a pictograph follows —
              // the regex gives it back otherwise
              j = skipSelector(s, j + 1 + Character.charCount(next))
              more = true
            }
          }
        }
        n += 1; onMatch(i, j); i = j
      } else i += cw
    }
    n
  }

  private val noMatch: (Int, Int) => Unit = (_, _) => ()

  /** Emoji SEQUENCE count — native form of
    * regexp_count(c, TextFunctions.EmojiClass); one displayed emoji
    * (keycap / flag pair / pictographic ZWJ chain with optional VS16 or
    * skin-tone per pictograph) counts once. */
  def emojiCount(text: UTF8String): Int =
    scanEmoji(text.toString, noMatch)

  // [ \t\n\f\r] spelled out: the engine-shared whitespace set (see
  // isWsChar) — the DuckDB mirrors' RE2 reads `\s` as exactly this.
  private val FpStrip = Pattern.compile("[^a-z0-9 \t\n\f\r]")
  private val FpSpaces = Pattern.compile("[ \t\n\f\r]+")

  /** Normalized fingerprint: lowercase → strip non-alnum → collapse
    * whitespace → md5 hex. Identical to
    * md5(regexp_replace(regexp_replace(lower(c), …), …)): the lowercase
    * IS UTF8String.toLowerCase (what Spark's Lower evaluates) and the
    * two patterns are the same regexes, fused without intermediate
    * UTF8String round-trips. */
  def fingerprint(text: UTF8String): UTF8String = {
    val lowered = text.toLowerCase.toString
    val normalized = FpSpaces.matcher(
      FpStrip.matcher(lowered).replaceAll("")).replaceAll(" ")
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(normalized.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      hex(2 * i) = Character.forDigit(b >> 4, 16)
      hex(2 * i + 1) = Character.forDigit(b & 0xf, 16)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** Tokens (with repeats) that are members of `set`. */
  def tokenSetCount(toks: ArrayData, set: java.util.HashSet[String]): Int = {
    var n = 0
    var i = 0
    while (i < toks.numElements()) {
      if (set.contains(toks.getUTF8String(i).toString)) n += 1
      i += 1
    }
    n
  }

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

  /** Positionwise equal-element count over two equal-length long arrays —
    * the native form of aggregate(zip_with(a, b, x==y ? 1 : 0), 0, +)
    * over MinHash signature vectors, whose interpreted per-pair lambda
    * was the hot cost of dd_minhash_estimate's pair-quadratic output. */
  def sigMatches(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"signature length mismatch: $n vs ${b.numElements()}")
    var m = 0L
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
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

  /** Winnowing fingerprints (Schleimer et al. 2003): k-gram md5-window
    * hashes ([[be32]] of the digest = the hexLong/conv hex window both
    * oracles use), per-window rightmost-min selection via the
    * h·2^posBits + (2^posBits−1−pos) key, distinct selected hashes.
    * One JVM pass per row — the interpreted higher-order-function form
    * of the same algebra measured 249.6 s vs 2.86 s native at sf0.1
    * (87×; md5 + string conv per gram, per lambda element). Positions
    * ≥ 2^posBits would alias the rightmost-min key into a DIFFERENT
    * hash's band — phantom fingerprints both engines would mirror, so
    * the oracle gate could never catch it — hence the loud guard:
    * chunk >2^posBits-gram documents upstream. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int, posBits: Int): ArrayData = {
    val toks = tokenize(text.toString)
    val m = toks.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    require(m <= (1L << posBits),
      s"winnow_fingerprints: $m grams exceeds the 2^$posBits position " +
        "capacity — key packing would alias silently; chunk the document " +
        "upstream or raise posBits")
    val md = mdLocal.get()
    val scale = 1L << posBits
    val keys = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val h = be32(md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 0)
      keys(i) = h * scale + (scale - 1 - i)
      i += 1
    }
    val sel = new java.util.LinkedHashSet[java.lang.Long]
    var s = 0
    val last = math.max(m - w, 0)
    while (s <= last) {
      var mn = Long.MaxValue
      var j = s
      val end = math.min(s + w, m)
      while (j < end) {
        if (keys(j) < mn) mn = keys(j)
        j += 1
      }
      sel.add(mn / scale)
      s += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
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

  // ---- one-pass reward statistics ----

  // \s spelled out as the engine-shared set (see isWsChar)
  private val Ws = " \t\n\f\r"
  private val BulletNum = Pattern.compile(s"^[$Ws]*[0-9]+[.)][$Ws]+")
  private val BulletLet = Pattern.compile(s"^[$Ws]*[A-Za-z][.)][$Ws]+")
  private val BulletSym = Pattern.compile(s"^[$Ws]*[-*•][$Ws]+")
  // p17's line classifiers (letter runs + any leading symbol) differ from
  // the reward suite's — both families are counted in the same line scan.
  private val StyleLet = Pattern.compile(s"^[$Ws]*[A-Za-z]+[.)][$Ws]+")
  private val StyleSym = Pattern.compile(s"^[$Ws]*[^A-Za-z0-9_$Ws]")
  private val TailHashtagRe = Pattern.compile("#[A-Za-z0-9_]+")

  /** Deterministic sentiment lexicon for the arc re-expression
    * (training/rewards/base.py get_sentiment_scores replaces VADER with an
    * exact token-membership count; case-sensitive so both engines compare
    * raw tokens). */
  val PosWords: Array[String] = Array("good", "great", "love", "happy",
    "excellent", "win", "best", "amazing", "success", "growth")
  val NegWords: Array[String] = Array("bad", "terrible", "hate", "sad",
    "poor", "fail", "worst", "awful", "loss", "problem")
  private val posSet = { val s = new java.util.HashSet[String](); PosWords.foreach(s.add); s }
  private val negSet = { val s = new java.util.HashSet[String](); NegWords.foreach(s.add); s }

  /** Spark's `trim`/DuckDB's `trim` strip ASCII 0x20 only — NOT Java's
    * String.trim (which strips all control chars <= 0x20). */
  private def trimSpaces(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  private def isAsciiAlpha(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return false
      i += 1
    }
    w.nonEmpty
  }

  private def lowerAscii(w: String): String = {
    val a = new Array[Char](w.length)
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      a(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(a)
  }

  private def isCharRun(s: String, c: Char): Boolean = {
    if (s.length < 3) return false
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) != c) return false
      i += 1
    }
    true
  }

  private def distinctSet(toks: Array[String]): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](toks.length * 2)
    toks.foreach(set.add)
    set
  }

  /** |a ∩ b| for two distinct-element sets. */
  private def interSize(a: java.util.HashSet[String], b: java.util.HashSet[String]): Int = {
    val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
    var n = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) n += 1
    n
  }

  /** All per-row statistics the reward suite needs that would otherwise
    * run as interpreted HOF lambda chains — one pass over the text.
    * Field semantics mirror the Column/DuckDB formulations exactly (see
    * RewardStats in [[NativeExpressions]] for the schema and
    * RewardsKernelSpec for the equivalence assertions):
    *
    *  - awords_*: whitespace tokens matching ^[A-Za-z]+$, lowercased
    *  - sent_*: token-count moments over "[.!?]+"-split, space-trim
    *    non-blank sentences
    *  - sim_avg_ppm: mean adjacent-paragraph distinct-token Jaccard in
    *    ppm (floor div; 1000000 for an empty union; 500000 with <2 paras)
    *  - arc: 0 Neutral (<3 sentences) / 1 Rising / 2 Falling / 3 Flat /
    *    4 Variable over per-sentence lexicon scores (pos − neg counts)
    *  - flow_transitions: adjacent sentence pairs with <2 shared
    *    distinct tokens
    *  - bullet/divider flags per training/rewards/bullet_style.py:36-40,
    *    divider.py:7-35 line classifiers
    *  - emo_*: total + distinct [[TextFunctions.EmojiClass]] matches
    */
  def rewardStats(text: UTF8String): InternalRow = {
    val s = text.toString

    // Alpha-word vocabulary
    val toks = tokenize(s)
    var awTotal = 0
    val awSet = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (isAsciiAlpha(w)) {
        awTotal += 1
        awSet.add(lowerAscii(w))
      }
      i += 1
    }

    // Sentences: token-count moments, lexicon scores, flow transitions
    val sents = s.split("[.!?]+", -1).filter(x => trimSpaces(x).nonEmpty)
    val sentToks = sents.map(tokenize)
    val sentN = sents.length
    var sentSum = 0L
    var sentSumSq = 0L
    val scores = new Array[Long](sentN)
    i = 0
    while (i < sentN) {
      val st = sentToks(i)
      val n = st.length.toLong
      sentSum += n
      sentSumSq += n * n
      var sc = 0L
      var j = 0
      while (j < st.length) {
        if (posSet.contains(st(j))) sc += 1
        else if (negSet.contains(st(j))) sc -= 1
        j += 1
      }
      scores(i) = sc
      i += 1
    }
    val arc =
      if (sentN < 3) 0
      else {
        val first = scores(0)
        val middle = scores(sentN / 2)
        val last = scores(sentN - 1)
        if (first < middle && middle < last && last > 0) 1
        else if (first > middle && middle > last && last < 0) 2
        else if (last == first && middle == 0) 3
        else 4
      }
    var flowTransitions = 0
    if (sentN >= 2) {
      var prev = distinctSet(sentToks(0))
      i = 1
      while (i < sentN) {
        val cur = distinctSet(sentToks(i))
        if (interSize(prev, cur) < 2) flowTransitions += 1
        prev = cur
        i += 1
      }
    }

    // Adjacent-paragraph distinct-token Jaccard (ppm, floor division)
    val paras = s.split("\n\n", -1).filter(x => trimSpaces(x).nonEmpty)
    val nSims = math.max(paras.length - 1, 0)
    var simAvg = 500000L
    if (nSims > 0) {
      var simSum = 0L
      var prev = distinctSet(tokenize(paras(0)))
      i = 1
      while (i < paras.length) {
        val cur = distinctSet(tokenize(paras(i)))
        val inter = interSize(prev, cur).toLong
        val uni = prev.size.toLong + cur.size.toLong - inter
        simSum += (if (uni > 0) inter * 1000000L / uni else 1000000L)
        prev = cur
        i += 1
      }
      simAvg = simSum / nSims
    }

    // Line classifiers: bullets + dividers (counts) + tail hashtags
    val lines = s.split("\n", -1)
    var bulletAny = s.contains("•")
    var divDash = 0
    var divEq = 0
    var divStar = 0
    var divTilde = 0
    var nEmpty = 0
    var nNum = 0
    var nLetPlus = 0
    var nSym = 0
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.isEmpty) nEmpty += 1
      val isNum = BulletNum.matcher(l).find()
      if (isNum) nNum += 1
      if (StyleLet.matcher(l).find()) nLetPlus += 1
      if (StyleSym.matcher(l).find()) nSym += 1
      if (!bulletAny &&
        (isNum || BulletLet.matcher(l).find() ||
          BulletSym.matcher(l).find())) bulletAny = true
      val tl = trimSpaces(l)
      if (isCharRun(tl, '-')) divDash += 1
      if (isCharRun(tl, '=')) divEq += 1
      if (isCharRun(tl, '*')) divStar += 1
      if (isCharRun(tl, '~')) divTilde += 1
      i += 1
    }

    // All-token totals (vocab_distinct over raw tokens, not alpha-only)
    val tokSet = new java.util.HashSet[String](toks.length * 2)
    toks.foreach(tokSet.add)
    var tailHashtags = 0
    if (lines.nonEmpty) {
      val tm = TailHashtagRe.matcher(lines(lines.length - 1))
      while (tm.find()) tailHashtags += 1
    }

    // Emoji variety — the native scanner, not EmojiRe: the sequence
    // grammar's alternation is pathological under Java's backtracking
    // engine (same 6× wall as emojiCount's regexp_count form)
    val emoSet = new java.util.HashSet[String]()
    val emoTotal = scanEmoji(s, (a, b) => { emoSet.add(s.substring(a, b)); () })

    // Punctuation-family counts (single char scan)
    var nPeriod = 0L; var nComma = 0L; var nExclaim = 0L
    var nQuestion = 0L; var nSemicolon = 0L
    i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '.' => nPeriod += 1
        case ',' => nComma += 1
        case '!' => nExclaim += 1
        case '?' => nQuestion += 1
        case ';' => nSemicolon += 1
        case _ =>
      }
      i += 1
    }

    var scoreSum = 0L
    i = 0
    while (i < sentN) { scoreSum += scores(i); i += 1 }

    new GenericInternalRow(Array[Any](
      awTotal, awSet.size, sentN, sentSum, sentSumSq, simAvg, arc,
      flowTransitions, bulletAny, divDash, divEq, divStar, divTilde,
      emoTotal, emoSet.size, lines.length, tailHashtags,
      nPeriod, nComma, nExclaim, nQuestion, nSemicolon, scoreSum,
      nEmpty, nNum, nLetPlus, nSym, toks.length, tokSet.size))
  }

  /** int8 scalar-quantized dot product: each coordinate is clipped to
    * [-1, 1] and affine-mapped to a signed byte — q = ⌊clip(x)·127 + 0.5⌋,
    * the half-UP rounding both engines spell identically as floor(v + 0.5)
    * (math.round / DuckDB round() disagree on negative halves) — then the
    * two integer codes multiply-accumulate in exact Long arithmetic. The
    * quantized score is bit-reproducible across engines and partitionings
    * (no IEEE accumulation-order sensitivity at all), which is why the
    * sq8 path can hash-match a DuckDB mirror while staying the memory-
    * bandwidth-cheap scan shape (1 byte/dim vs 4) a 100 TB ANN sweep
    * wants. */
  // NaN clips HIGH (code 127): both mirror dialects order NaN greater
  // than every number (Spark least/greatest, DuckDB LEAST/GREATEST), so
  // their clip chains yield 1.0 for a NaN coordinate — but math.min/max
  // PROPAGATE NaN, whose toLong is 0. Without this branch a corrupt
  // float diverges the engines by 127 codes and breaks the hash gate.
  private def q8(x: Double): Long =
    if (x.isNaN) 127L
    else math.floor(math.max(-1.0, math.min(1.0, x)) * 127.0 + 0.5).toLong

  def sq8Dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Long = {
    var acc = 0L
    var i = 0
    val n = sameDim(a, b)
    while (i < n) {
      acc += q8(at(a, i, aFloat)) * q8(at(b, i, bFloat))
      i += 1
    }
    acc
  }

  /** Per-CLUSTER SemDeDup verdicts — the dd_semantic pair scan as one
    * native pass over a cluster's collected members instead of a
    * 426M-row self-join (measured at the 100× corpus: the SortMergeJoin
    * machinery — copying two vector payloads into a joined row per
    * candidate pair — cost ~2.3 µs/pair·core, 30+ s/pass, while the
    * same cosines in this tight loop are ~2 s; a scaled-sq8 prescreen
    * variant was measured SLOWER than the float loop it screened,
    * because the join row traffic, not the arithmetic, was the floor).
    *
    * `members` is ARRAY<STRUCT<vec_id BIGINT, v ARRAY<FLOAT|DOUBLE>>>;
    * output is one STRUCT<vec_id, n_dups, min_other> per member, where
    * a pair is a duplicate iff cos·10⁶ ≥ `minCosX1e6` — callers pass
    * thresholdPpm − 0.5, which is EXACTLY the decision round(cos·10⁶)
    * ≥ thresholdPpm makes (round-half-up via shortest-decimal BigDecimal
    * is order-preserving against the representable bound), so verdicts
    * are bit-identical to the join+round+filter form the DuckDB oracle
    * still computes. min_other = Long.MaxValue when a member has no
    * duplicate partner.
    *
    * Arithmetic parity with [[cosine]]: dot and each norm² accumulate
    * in index order (interleaving in one loop vs separate loops cannot
    * change an IEEE sum over the same index order), final expression
    * dot/(√nx·√ny) identical. NaN cosine (zero or corrupt vector)
    * compares false and is NOT a duplicate — the defined semantics of
    * the `>=` filter (the join form crashed on ANSI NaN→long instead;
    * SemanticScreenSpec pins the new contract).
    *
    * State/skew: per-group memory is |cluster|·(8 + 8·dim) bytes and
    * work is the SemDeDup contract's Σ|cluster|² cosines concentrated
    * in that group's task — bounded because cluster count grows with
    * the corpus (seed density 1/[[graft.operators.Similarity
    * .LloydsSeedMod]]) keeping expected occupancy constant; a skewed
    * bucket was equally one SMJ key before. */
  def semanticVerdicts(members: ArrayData, minCosX1e6: Double,
      vFloat: Boolean): ArrayData = {
    val m = members.numElements()
    val ids = new Array[Long](m)
    val vs = new Array[Array[Double]](m)
    val norm = new Array[Double](m)
    var i = 0
    while (i < m) {
      val s = members.getStruct(i, 2)
      ids(i) = s.getLong(0)
      val arr = s.getArray(1)
      val n = arr.numElements()
      val v = new Array[Double](n)
      var nx = 0.0
      var k = 0
      while (k < n) {
        val x = at(arr, k, vFloat)
        v(k) = x
        nx += x * x
        k += 1
      }
      vs(i) = v
      norm(i) = math.sqrt(nx)
      i += 1
    }
    val nDups = new Array[Long](m)
    val minOther = Array.fill(m)(Long.MaxValue)
    i = 0
    while (i < m) {
      val va = vs(i)
      var j = i + 1
      while (j < m) {
        val vb = vs(j)
        require(va.length == vb.length,
          s"vector dimension mismatch: ${va.length} vs ${vb.length}")
        var dot = 0.0
        var k = 0
        while (k < va.length) {
          dot += va(k) * vb(k)
          k += 1
        }
        val c = dot / (norm(i) * norm(j))
        if (c * 1000000.0 >= minCosX1e6) {
          nDups(i) += 1
          nDups(j) += 1
          if (ids(j) < minOther(i)) minOther(i) = ids(j)
          if (ids(i) < minOther(j)) minOther(j) = ids(i)
        }
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = new GenericInternalRow(Array[Any](ids(i), nDups(i), minOther(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ALL word n-gram occurrences in order (space-joined adjacent tokens)
    * — the native form of the zip_with(slice, slice, concat) chain, whose
    * lambda evaluates interpreted per element. Distinct-shingle callers
    * use [[wordShingles]]; LM/counting callers need every occurrence. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text.toString)
    val total = toks.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total)
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Intra-document n-gram repetition in ONE text pass: per-n-gram
    * occurrence counts (space-joined adjacent tokens — the same n-grams
    * the SQL mirror's unnest + GROUP BY builds) reduced to (total
    * occurrences, occurrences of the most frequent n-gram, occurrences
    * belonging to n-grams seen ≥ 2 times). Gopher's duplicate-n-gram
    * screens as a map-only kernel: the relational form shuffles every
    * (doc, n-gram) posting; this never shuffles at all. Fewer than n
    * tokens → all zeros (callers filter or guard the division). */
  def ngramRepetition(text: UTF8String, n: Int): InternalRow = {
    val toks = tokenize(text.toString)
    val total = toks.length - n + 1
    if (total <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      counts.merge(sb.toString, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue
      if (c > top) top = c
      if (c >= 2) dup += c
    }
    new GenericInternalRow(Array[Any](total.toLong, top, dup))
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

  /** Nearest centroid by squared L2 over an array of (c_id, cv) structs —
    * the native form of array_min(transform(cents, c ⇒ struct(l2sq, id))):
    * strict lexicographic (distance, id) minimum, so ties pick the
    * smallest centroid id exactly like the struct ordering the DuckDB
    * oracle mirrors. */
  def argminL2(v: ArrayData, cents: ArrayData, vFloat: Boolean, cvFloat: Boolean): InternalRow = {
    var bestD = Double.PositiveInfinity
    var bestId = Long.MaxValue
    var found = false
    var nanMinId = Long.MaxValue
    var i = 0
    while (i < cents.numElements()) {
      val c = cents.getStruct(i, 2)
      val id = c.getLong(0)
      val d = l2Sq(v, c.getArray(1), vFloat, cvFloat)
      // NaN never wins against a finite distance: array_min's struct
      // ordering sorts NaN greatest, so the HOF form this replaces picks
      // the finite minimum. A NaN in the first slot must not be retained
      // by `d < bestD` always failing.
      if (!d.isNaN && (!found || d < bestD || (d == bestD && id < bestId))) {
        bestD = d
        bestId = id
        found = true
      }
      if (d.isNaN && id < nanMinId) nanMinId = id
      i += 1
    }
    // All-NaN: the HOF struct ordering treats NaN distances as equal and
    // ties on the id, yielding (NaN, min id) — match it rather than
    // returning null, so no vector silently vanishes at the cluster-id
    // equi-join downstream. Empty centroid array: null (array_min of []).
    if (found) new GenericInternalRow(Array[Any](bestD, bestId))
    else if (nanMinId != Long.MaxValue)
      new GenericInternalRow(Array[Any](Double.NaN, nanMinId))
    else null
  }

  /** Top-2 of [[argminL2]] in the same single pass: (nearest distance,
    * nearest id, second-nearest distance) over the centroid array —
    * replaces the interpreted transform+array_sort the separability
    * operator would otherwise pay per row (O(k log k) sort + per-element
    * lambda vs one O(k) codegen'd scan; measured 52 s → sort-free at 20×
    * density with 800 centroids). Ordering matches array_sort on
    * struct(d, c_id) exactly: (d asc, id asc), NaN distances greatest,
    * ties among NaNs by id. With a single centroid the second distance
    * equals the first (the caller's b2 = a2 ⇒ silhouette 0 fallback);
    * empty array → null. */
  def argmin2L2(v: ArrayData, cents: ArrayData, vFloat: Boolean, cvFloat: Boolean): InternalRow = {
    var d1 = Double.PositiveInfinity
    var id1 = Long.MaxValue
    var have1 = false
    var d2 = Double.PositiveInfinity
    var id2 = Long.MaxValue
    var have2 = false
    var nan1 = Long.MaxValue // two smallest ids among NaN distances
    var nan2 = Long.MaxValue
    var i = 0
    while (i < cents.numElements()) {
      val c = cents.getStruct(i, 2)
      val id = c.getLong(0)
      val d = l2Sq(v, c.getArray(1), vFloat, cvFloat)
      if (d.isNaN) {
        if (id < nan1) { nan2 = nan1; nan1 = id }
        else if (id < nan2) nan2 = id
      } else if (!have1 || d < d1 || (d == d1 && id < id1)) {
        d2 = d1; id2 = id1; have2 = have1
        d1 = d; id1 = id; have1 = true
      } else if (!have2 || d < d2 || (d == d2 && id < id2)) {
        d2 = d; id2 = id; have2 = true
      }
      i += 1
    }
    // merge the NaN tail in sorted position (finite < NaN always)
    if (!have1 && nan1 == Long.MaxValue) return null
    val (fd, fid) = if (have1) (d1, id1) else (Double.NaN, nan1)
    val sd =
      if (have1 && have2) d2
      else if (have1 && nan1 != Long.MaxValue) Double.NaN
      else if (!have1 && nan2 != Long.MaxValue) Double.NaN
      else fd // single centroid: second = first
    new GenericInternalRow(Array[Any](fd, fid, sd))
  }

  /** Sign-LSH bucket: bit p is set when dot(v, planes(p)) > 0. The
    * accumulation is strict left-to-right (0 + w_0·v_0 + w_1·v_1 + …), the
    * same IEEE sequence the ±-literal DuckDB mirror evaluates, so the sign
    * — and hence the bucket — is identical in both engines. */
  def signLshBucket(v: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    var b = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      require(v.numElements() == w.length,
        s"vector dimension mismatch: ${v.numElements()} vs plane ${w.length}")
      var acc = 0.0
      var j = 0
      while (j < w.length) {
        acc += w(j) * at(v, j, isFloat)
        j += 1
      }
      if (acc > 0) b |= 1L << p
      p += 1
    }
    b
  }

  /** The `n` nearest centroid ids by (L2², c_id) — the native form of
    * `slice(array_sort(transform(cents, c -> struct(l2_sq(v, c.cv), c.c_id))), 1, n)`
    * projected to ids: one O(|cents|·dim) pass with an insertion-select
    * over n slots instead of an interpreted per-element lambda plus a
    * full |cents| sort. Ordering is bit-identical to array_sort on
    * struct(double, bigint): ascending d with NaN sorting AFTER every
    * finite value and equal to itself (so NaN ties, like d ties, fall to
    * ascending c_id) — the probe tie-break every IVF oracle mirrors. */
  def topNCentroidIds(
      v: ArrayData, cents: ArrayData, n: Int,
      vFloat: Boolean, cvFloat: Boolean): ArrayData = {
    val k = math.min(n, cents.numElements())
    val ds = new Array[Double](k)
    val ids = new Array[Long](k)
    var filled = 0
    // lt: (isNaN, d, id) lexicographic with NaN == NaN (struct sort order)
    def lt(d1: Double, id1: Long, d2: Double, id2: Long): Boolean = {
      val n1 = d1.isNaN; val n2 = d2.isNaN
      if (n1 != n2) n2
      else if (!n1 && d1 != d2) d1 < d2
      else id1 < id2
    }
    var i = 0
    while (i < cents.numElements()) {
      val c = cents.getStruct(i, 2)
      val id = c.getLong(0)
      val d = l2Sq(v, c.getArray(1), vFloat, cvFloat)
      if (filled < k || lt(d, id, ds(filled - 1), ids(filled - 1))) {
        var j = math.min(filled, k - 1)
        while (j > 0 && lt(d, id, ds(j - 1), ids(j - 1))) {
          ds(j) = ds(j - 1); ids(j) = ids(j - 1); j -= 1
        }
        ds(j) = d; ids(j) = id
        if (filled < k) filled += 1
      }
      i += 1
    }
    new GenericArrayData(ids.take(filled).map(Long.box(_)).toArray[Any])
  }

  /** Deterministic synonym augmentation — the native form of
    * Synonyms.sparkAug's `array_join(transform(split(text, ' '), x ->
    * CASE WHEN md5-gate THEN table-lookup ELSE x END), ' ')`:
    * token `x` is replaced by `map(lower(x))` iff the high nibble of
    * md5(lower(x) + "#" + slot)'s first byte is ≤ 7 (= first hex char
    * ≤ '7') and the lowered token is in the table. Splitting on the
    * single byte 0x20 and re-joining with it reconstructs the exact
    * split(' ')/array_join(' ') round-trip (interior AND trailing empty
    * segments preserved — Spark's split uses limit -1); 0x20 never
    * occurs inside a multi-byte UTF-8 sequence, so the byte walk is
    * UTF-8 safe. Lowercasing is UTF8String.toLowerCase — bit-identical
    * to what Spark's Lower evaluates inside the HOF. */
  def synonymAug(
      text: UTF8String, slot: Long, map: java.util.HashMap[String, String]): UTF8String = {
    val bytes = text.getBytes
    val slotBytes =
      java.lang.Long.toString(slot).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md = mdLocal.get()
    val out = new java.io.ByteArrayOutputStream(bytes.length + 16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (start > 0) out.write(' ')
        val lowered = UTF8String.fromBytes(bytes, start, i - start).toLowerCase
        md.reset()
        md.update(lowered.getBytes)
        md.update('#'.toByte)
        md.update(slotBytes)
        val gated = ((md.digest()(0) >> 4) & 0xf) <= 7
        val rep = if (gated) map.get(lowered.toString) else null
        if (rep != null) out.write(rep.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        else out.write(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Merge-table BPE subword stats — (n_words, n_alpha_chars,
    * n_bpe_tokens) in one byte pass + per-word span walk (see
    * [[Bpe]] for the algorithm and the engine-mirroring contract).
    *
    * Tokens are always CONTIGUOUS substrings of their word (a merge of
    * adjacent spans is a span), so the token list is just an array of
    * span start offsets into the text bytes — each merge rule is one
    * in-place compaction pass, no string materialization anywhere.
    * Case folding is the ASCII `| 0x20` (word bytes are [A-Za-z] by
    * construction); multi-byte UTF-8 units are ≥ 0x80 and never enter
    * a word. Semantics pinned against [[Bpe.tokenCountViaReplaceChain]]
    * (the oracle's replace-chain formulation) by BpeSpec. */
  def bpeSubwordStats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val rules = Bpe.MergeBytes
    var nWords = 0L
    var nChars = 0L
    var nTokens = 0L
    var spanBuf = new Array[Int](32)

    @inline def isAlpha(b: Byte): Boolean = {
      val lb = b | 0x20
      b >= 0 && lb >= 'a' && lb <= 'z'
    }

    var i = 0
    while (i < n) {
      while (i < n && !isAlpha(bytes(i))) i += 1
      val ws = i
      while (i < n && isAlpha(bytes(i))) i += 1
      if (i > ws) {
        val we = i
        val len = we - ws
        nWords += 1L
        nChars += len.toLong
        if (len > spanBuf.length) spanBuf = new Array[Int](len)
        var m = 0
        while (m < len) { spanBuf(m) = ws + m; m += 1 } // one span per char
        var r = 0
        while (r < rules.length && m > 1) {
          val p = rules(r)._1
          val q = rules(r)._2
          // one left-to-right non-overlapping pass for this rule
          var read = 0
          var write = 0
          while (read < m) {
            // Under read < m-1, read+1 < m always holds, so the first
            // span's end is spanBuf(read+1); only the second span can
            // run to the word end (read+2 == m).
            if (read < m - 1 &&
                spanEq(bytes, spanBuf(read), spanBuf(read + 1), p) &&
                spanEq(bytes, spanBuf(read + 1),
                  (if (read + 2 < m) spanBuf(read + 2) else we), q)) {
              spanBuf(write) = spanBuf(read)
              read += 2
            } else {
              spanBuf(write) = spanBuf(read)
              read += 1
            }
            write += 1
          }
          m = write
          r += 1
        }
        nTokens += m.toLong
      }
    }
    new GenericInternalRow(Array[Any](nWords, nChars, nTokens))
  }

  /** Per-probed-cluster exact top-k neighbor selection — the knn-graph
    * build's candidate scan ([[graft.operators.Similarity]] knnEdges) as
    * ONE native pass per (probe, cluster) row. The r14 form was a
    * shuffle join whose output materialized every (query, bucket-member)
    * candidate as a joined row carrying BOTH 64-double vector payloads
    * (312M rows at the 100× corpus, 200.9 s) — the same row-traffic
    * floor the dd_semantic kernel removed. Here the members list rides
    * the join ONCE per (query, cluster) and only the per-cluster top-k
    * (≤ k id/cos structs) leaves the kernel, so the downstream global
    * top-k merge sees |corpus|·NProbe·k rows, not the full fan-in.
    *
    * Bit-exactness: cos is computed with exactly [[cosine]]'s operation
    * sequence (left-to-right dot and norms, dot/(√nx·√ny)); ordering is
    * (cos desc, vec_id asc) with java.lang.Double.compare — the same
    * NaN-first-on-desc and -0.0<0.0 total order Spark's sort gives the
    * old Window plan, so merging per-cluster partials reproduces the
    * global top-k row-for-row (each candidate lives in exactly one
    * bucket; KnnGraphSpec's ss_ivf_topk equality pins it). */
  def knnTopK(qv: ArrayData, qId: Long, members: ArrayData, k: Int,
      qFloat: Boolean, mFloat: Boolean): ArrayData = {
    val dim = qv.numElements()
    val q = new Array[Double](dim)
    var nx = 0.0
    var i = 0
    while (i < dim) {
      val x = at(qv, i, qFloat)
      q(i) = x
      nx += x * x
      i += 1
    }
    val nq = math.sqrt(nx)
    val m = members.numElements()
    val topIds = new Array[Long](k)
    val topCos = new Array[Double](k)
    var size = 0
    @inline def better(c1: Double, id1: Long, c2: Double, id2: Long): Boolean = {
      val cmp = java.lang.Double.compare(c1, c2)
      cmp > 0 || (cmp == 0 && id1 < id2)
    }
    i = 0
    while (i < m) {
      val s = members.getStruct(i, 2)
      val id = s.getLong(0)
      if (id != qId) {
        val arr = s.getArray(1)
        require(arr.numElements() == dim,
          s"vector dimension mismatch: ${arr.numElements()} vs $dim")
        var dot = 0.0
        var ny = 0.0
        var j = 0
        while (j < dim) {
          val y = at(arr, j, mFloat)
          dot += q(j) * y
          ny += y * y
          j += 1
        }
        val c = dot / (nq * math.sqrt(ny))
        if (size < k || better(c, id, topCos(size - 1), topIds(size - 1))) {
          var p = math.min(size, k - 1)
          if (size < k) size += 1
          while (p > 0 && better(c, id, topCos(p - 1), topIds(p - 1))) {
            topCos(p) = topCos(p - 1)
            topIds(p) = topIds(p - 1)
            p -= 1
          }
          topCos(p) = c
          topIds(p) = id
        }
      }
      i += 1
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) {
      out(i) = new GenericInternalRow(Array[Any](topIds(i), topCos(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- Entity-candidate detection (rw_entities / tx_pattern_canary) ----

  /** Outer-punctuation strip — the walk form of
    * regexp_replace(x, "^[^A-Za-z0-9]+|[^A-Za-z0-9]+$", ""): the leading
    * and trailing runs of non-ASCII-alnum UTF-16 units go, interior
    * punctuation stays ("(Acme))" → "Acme", "a!b" → "a!b", "——" → ""). */
  @inline private def isAlnumAscii(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  private def stripOuterPunct(s: String): String = {
    var lo = 0
    var hi = s.length - 1
    while (lo <= hi && !isAlnumAscii(s.charAt(lo))) lo += 1
    while (hi > lo && !isAlnumAscii(s.charAt(hi))) hi -= 1
    if (lo > hi) "" else if (lo == 0 && hi == s.length - 1) s
    else s.substring(lo, hi + 1)
  }

  /** Java-regex '.' (no DOTALL) excludes the five line terminators —
    * kept explicit so the char test matches `rlike '^[A-Z].'` exactly.
    * \n and \r can't survive the whitespace tokenizer; NEL/LS/PS can. */
  @inline private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == 0x85.toChar ||
      c == 0x2028.toChar || c == 0x2029.toChar

  /** The capitalized-token test `rlike '^[A-Z].'` as char compares:
    * first char ASCII A–Z, and a second char '.' would match. */
  @inline private def isCapToken(s: String): Boolean =
    s.length >= 2 && s.charAt(0) >= 'A' && s.charAt(0) <= 'Z' &&
      !isLineTerm(s.charAt(1))

  /** Spark `lower` semantics without the per-call UTF8String round-trip:
    * pure-ASCII strings lower in place (UTF8String's ASCII fast path);
    * anything else routes through UTF8String.toLowerCase for bit
    * identity with the Lower expression the HOF form evaluated. */
  private def sparkLower(s: String): String = {
    var i = 0
    var hasUpper = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80) return UTF8String.fromString(s).toLowerCase.toString
      if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (!hasUpper) return s
    val arr = new Array[Char](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      arr(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(arr)
  }

  /** Entity-candidate stats in ONE text pass — the native form of the
    * rw_entities adjacent-pair HOF pipeline (Entities.withEntityColsHof:
    * tokenize → outer-punct strip → three filtered pair
    * comprehensions), which ran interpreted transform/filter lambdas
    * with a per-token rlike. Per cleaned-token pair (ct_i, ct_{i+1}):
    *
    *  - person: both capitalized ([[isCapToken]]) — count + first pair
    *    "a b", plus the first pair in `namePool` (the violations name
    *    table) as injected_name
    *  - honorific: lower(ct_i) ∈ honorifics AND cap(ct_{i+1})
    *  - org: cap(ct_i) AND lower(ct_{i+1}) ∈ orgSuffixes
    *
    * Returns (n_person, person_first, injected_name, n_honorific,
    * honorific_first, n_org, org_first) with '' for absent firsts —
    * see NativeExpressions.entityStatsType. EntitiesKernelSpec pins the
    * differential against the HOF form; tx_pattern_canary rows 18–19
    * pin the family cross-engine per round. */
  def entityStats(
      text: UTF8String,
      honorifics: java.util.HashSet[String],
      orgSuffixes: java.util.HashSet[String],
      namePool: java.util.HashSet[String]): InternalRow = {
    val toks = tokenize(text.toString)
    val n = toks.length
    val ct = new Array[String](n)
    var i = 0
    while (i < n) { ct(i) = stripOuterPunct(toks(i)); i += 1 }
    var nPerson = 0L
    var personFirst: String = null
    var injected: String = null
    var nHonor = 0L
    var honorFirst: String = null
    var nOrg = 0L
    var orgFirst: String = null
    i = 0
    while (i + 1 < n) {
      val a = ct(i)
      val b = ct(i + 1)
      val capA = isCapToken(a)
      val capB = isCapToken(b)
      if (capB) {
        if (capA) {
          nPerson += 1
          if (personFirst == null || injected == null) {
            val pair = a + " " + b
            if (personFirst == null) personFirst = pair
            if (injected == null && namePool.contains(pair)) injected = pair
          }
        }
        if (honorifics.contains(sparkLower(a))) {
          nHonor += 1
          if (honorFirst == null) honorFirst = a + " " + b
        }
      }
      if (capA && orgSuffixes.contains(sparkLower(b))) {
        nOrg += 1
        if (orgFirst == null) orgFirst = a + " " + b
      }
      i += 1
    }
    def s(v: String): UTF8String = UTF8String.fromString(if (v == null) "" else v)
    new GenericInternalRow(Array[Any](
      nPerson, s(personFirst), s(injected),
      nHonor, s(honorFirst), nOrg, s(orgFirst)))
  }

  /** Case-folded byte-range equality against a rule token. */
  @inline private def spanEq(
      bytes: Array[Byte], start: Int, end: Int, tok: Array[Byte]): Boolean = {
    if (end - start != tok.length) return false
    var i = 0
    while (i < tok.length) {
      if ((bytes(start + i) | 0x20) != tok(i)) return false
      i += 1
    }
    true
  }
}
