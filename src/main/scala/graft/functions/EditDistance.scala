package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance as a native expression using Myers'
  * bit-parallel algorithm ("A fast bit-vector algorithm for approximate
  * string matching based on dynamic programming", JACM 1999) for patterns
  * up to 64 chars — ~1 word-op per text char instead of the O(n*m) DP cell
  * sweep Spark's built-in runs. Longer inputs fall back to the classic
  * two-row DP. Values are IDENTICAL to Spark's `levenshtein` and DuckDB's
  * (verified in FunctionsSpec) — this is a pure speedup for the pair-scoring
  * hot path, where edit distance dominates task CPU (q14 profile: 35.8s ->
  * the join condition evaluates levenshtein per candidate pair).
  */
case class EditDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"edit_distance requires (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditDistance.distance(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.EditDistance.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EditDistance {

  // Reusable per-thread Myers tables: 128-slot ASCII mask array plus the
  // list of slots touched by the current pattern (so reset is O(m), not 128).
  private val asciiPeq = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }
  private val touched = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }

  /** Exact Levenshtein distance (identical to Spark's built-in on BMP text;
    * our corpora are ASCII). Static so generated code can call it. ASCII
    * inputs take a zero-allocation byte path (UTF-8 bytes == chars there);
    * anything else decodes to String first. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    if (isAscii(a) && isAscii(b)) distanceAscii(a, b)
    else distance(a.toString, b.toString)
  }

  private[functions] def isAscii(s: UTF8String): Boolean = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Myers directly over the UTF8String's ASCII bytes — zero-copy,
    * zero-allocation per call (getBytes would copy parquet-backed strings).
    * Trims the common prefix and suffix first: lev(p·x·q, p·y·q) = lev(x, y)
    * (matched end characters never pay an edit — standard, also done by
    * DuckDB/commons-lang), which matters on templated corpora where pairs
    * share long literal prefixes ("Customer#0000...") — the bit-vector loop
    * then runs only over the differing core. */
  private def distanceAscii(a0: UTF8String, b0: UTF8String): Int = {
    import org.apache.spark.unsafe.Platform.getByte
    val aBase = a0.getBaseObject
    val aOff = a0.getBaseOffset
    val bBase = b0.getBaseObject
    val bOff = b0.getBaseOffset
    val na = a0.numBytes()
    val nb = b0.numBytes()
    val minLen = math.min(na, nb)
    var p = 0
    while (p < minLen && getByte(aBase, aOff + p) == getByte(bBase, bOff + p)) p += 1
    var q = 0
    val maxSuffix = minLen - p // keep prefix/suffix regions disjoint
    while (q < maxSuffix &&
      getByte(aBase, aOff + na - 1 - q) == getByte(bBase, bOff + nb - 1 - q)) q += 1
    val ma = na - p - q
    val mb = nb - p - q
    if (ma == 0) return mb
    if (mb == 0) return ma
    // pattern = shorter trimmed slice (bit-vector over its positions);
    // a trimmed core wider than one machine word goes to the two-row DP
    if (math.min(ma, mb) > 64)
      return dpDistance(a0.toString.substring(p, na - q), b0.toString.substring(p, nb - q))
    val (sBase, sOff, m, tBase, tOff, n) =
      if (ma <= mb) (aBase, aOff + p, ma, bBase, bOff + p, mb)
      else (bBase, bOff + p, mb, aBase, aOff + p, ma)

    val peq = asciiPeq.get()
    val touch = touched.get()
    var nTouch = 0
    var i = 0
    while (i < m) {
      val c = getByte(sBase, sOff + i) & 0x7f
      if (peq(c) == 0L) { touch(nTouch) = c; nTouch += 1 }
      peq(c) |= 1L << i
      i += 1
    }
    var vp = if (m == 64) -1L else (1L << m) - 1L
    var vn = 0L
    var score = m
    val highBit = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val eq = peq(getByte(tBase, tOff + j) & 0x7f)
      val xv = eq | vn
      val xh = (((eq & vp) + vp) ^ vp) | eq
      var ph = vn | ~(xh | vp)
      var mh = vp & xh
      if ((ph & highBit) != 0L) score += 1
      if ((mh & highBit) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      vp = mh | ~(xv | ph)
      vn = ph & xv
      j += 1
    }
    i = 0
    while (i < nTouch) { peq(touch(i)) = 0L; i += 1 }
    score
  }

  def distance(s0: String, t0: String): Int = {
    // Spark's levenshtein counts CODE POINTS, not UTF-16 units — strings
    // containing surrogate pairs (non-BMP, e.g. emoji) must be compared as
    // code-point arrays or the distance over-counts and levenshteinSim's
    // numerator can exceed its length()-based denominator (negative sim).
    // BMP-only strings take the cheaper char path below (char == code point).
    if (hasSurrogate(s0) || hasSurrogate(t0))
      return cpDistance(toCodePoints(s0), toCodePoints(t0))
    // pattern = shorter string (bit-vector over its positions)
    val (s, t) = if (s0.length <= t0.length) (s0, t0) else (t0, s0)
    val m = s.length
    val n = t.length
    if (m == 0) return n
    if (s == t) return 0
    if (m > 64) return dpDistance(s, t)

    val peq = asciiPeq.get()
    val touch = touched.get()
    var nTouch = 0
    var nonAscii: java.util.HashMap[Character, java.lang.Long] = null
    var i = 0
    while (i < m) {
      val c = s.charAt(i)
      if (c < 128) {
        if (peq(c) == 0L) { touch(nTouch) = c; nTouch += 1 }
        peq(c) |= 1L << i
      } else {
        if (nonAscii == null) nonAscii = new java.util.HashMap[Character, java.lang.Long]()
        val prev = nonAscii.get(c)
        nonAscii.put(c, (if (prev == null) 0L else prev.longValue()) | (1L << i))
      }
      i += 1
    }

    var vp = if (m == 64) -1L else (1L << m) - 1L
    var vn = 0L
    var score = m
    val highBit = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val c = t.charAt(j)
      val eq =
        if (c < 128) peq(c)
        else if (nonAscii == null) 0L
        else { val v = nonAscii.get(c); if (v == null) 0L else v.longValue() }
      val xv = eq | vn
      val xh = (((eq & vp) + vp) ^ vp) | eq
      var ph = vn | ~(xh | vp)
      var mh = vp & xh
      if ((ph & highBit) != 0L) score += 1
      if ((mh & highBit) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      vp = mh | ~(xv | ph)
      vn = ph & xv
      j += 1
    }
    // reset the thread-local table for the next call
    i = 0
    while (i < nTouch) { peq(touch(i)) = 0L; i += 1 }
    score
  }

  private def hasSurrogate(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= Character.MIN_SURROGATE && c <= Character.MAX_SURROGATE) return true
      i += 1
    }
    false
  }

  private def toCodePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Myers / DP over code-point arrays — the non-BMP slow path, value-
    * identical to Spark's code-point levenshtein. */
  private def cpDistance(s0: Array[Int], t0: Array[Int]): Int = {
    val (s, t) = if (s0.length <= t0.length) (s0, t0) else (t0, s0)
    val m = s.length
    val n = t.length
    if (m == 0) return n
    if (m > 64) return dpDistanceCp(s, t)
    val peqMap = new java.util.HashMap[Integer, java.lang.Long]()
    var i = 0
    while (i < m) {
      val c = s(i)
      val prev = peqMap.get(c)
      peqMap.put(c, (if (prev == null) 0L else prev.longValue()) | (1L << i))
      i += 1
    }
    var vp = if (m == 64) -1L else (1L << m) - 1L
    var vn = 0L
    var score = m
    val highBit = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val v = peqMap.get(t(j))
      val eq = if (v == null) 0L else v.longValue()
      val xv = eq | vn
      val xh = (((eq & vp) + vp) ^ vp) | eq
      var ph = vn | ~(xh | vp)
      var mh = vp & xh
      if ((ph & highBit) != 0L) score += 1
      if ((mh & highBit) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      vp = mh | ~(xv | ph)
      vn = ph & xv
      j += 1
    }
    score
  }

  private def dpDistanceCp(s: Array[Int], t: Array[Int]): Int = {
    val m = s.length
    val n = t.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i <= m) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= n) {
      cur(0) = j
      val tc = t(j - 1)
      var k = 1
      while (k <= m) {
        val cost = if (s(k - 1) == tc) 0 else 1
        cur(k) = math.min(math.min(cur(k - 1) + 1, prev(k) + 1), prev(k - 1) + cost)
        k += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(m)
  }

  /** Classic two-row DP fallback for patterns longer than 64 chars. */
  private def dpDistance(s: String, t: String): Int = {
    val m = s.length
    val n = t.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i <= m) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= n) {
      cur(0) = j
      val tc = t.charAt(j - 1)
      var k = 1
      while (k <= m) {
        val cost = if (s.charAt(k - 1) == tc) 0 else 1
        cur(k) = math.min(math.min(cur(k - 1) + 1, prev(k) + 1), prev(k - 1) + cost)
        k += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(m)
  }
}
