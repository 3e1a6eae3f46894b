package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-token overlap score — the native twin of the HOF formulation
  *
  * {{{
  *   size(array_intersect(array_distinct(split(a, "\\s+")),
  *                        array_distinct(split(b, "\\s+")))) /
  *     greatest(size(array_distinct(split(a, "\\s+"))),
  *              size(array_distinct(split(b, "\\s+"))))
  * }}}
  *
  * (reference token-overlap semantics, /root/reference/batch_mdm_gcp/
  * bigquery_utils.py:377-388), value-identical on every input — including
  * Java-split edge cases: a leading or trailing whitespace run (or an empty
  * string) contributes an empty-string token that both `array_distinct`
  * keeps and `array_intersect` can match (pinned in FunctionsSpec).
  *
  * Why native: `split` recompiles its regex `Pattern` and round-trips
  * UTF8String -> String -> String[] -> UTF8String[] on EVERY evaluation, and
  * the expression sits on the pair-scoring hot path where it runs once per
  * candidate pair — profiled at 10.2s of the 14s q46 scoring pass at sf0.1
  * (553k pairs), ~20x the cost of the Myers edit distance beside it. This
  * expression is one pass over the raw UTF-8 bytes, no regex, no
  * allocation beyond three small offset arrays.
  */
case class TokenOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_overlap requires (string, string), got ($l, $r)")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TokenOverlapOp.overlap(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TokenOverlapOp.overlap($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TokenOverlapOp {
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.array.ByteArrayMethods

  /** Java regex \s = [ \t\n\x0B\f\r] — ASCII-only, so a byte-level scan is
    * exact on UTF-8 (no whitespace byte can occur inside a multi-byte
    * sequence). */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Tokenization state for one side: distinct non-empty tokens as
    * (start, len, hash) triples addressed (base, offset) DIRECTLY over the
    * UTF8String payload — zero-copy, like EditDistance.distanceAscii next
    * door (`getBytes` would copy the payload per evaluation for offset- or
    * parquet-backed strings). Also tracks whether the side carries the
    * empty-string token (leading/trailing whitespace run or empty input —
    * Java `split(regex, -1)` keeps those empties). */
  private final class Toks(val base: AnyRef, val off: Long, val len: Int) {
    var n: Int = 0 // number of DISTINCT non-empty tokens
    val starts = new Array[Int](len / 2 + 1)
    val lens = new Array[Int](len / 2 + 1)
    val hashes = new Array[Long](len / 2 + 1)
    var hasEmpty: Boolean = false

    @inline private def at(i: Int): Byte = Platform.getByte(base, off + i)

    def tokenize(): Unit = {
      hasEmpty = len == 0 || isWs(at(0)) || isWs(at(len - 1))
      var i = 0
      while (i < len) {
        while (i < len && isWs(at(i))) i += 1
        if (i < len) {
          val from = i
          while (i < len && !isWs(at(i))) i += 1
          val tl = i - from
          val h = XXH64.hashUnsafeBytes(base, off + from, tl, 42L)
          // keep only if distinct so far (hash pre-filter, bytes confirm)
          var j = 0
          var dup = false
          while (j < n && !dup) {
            if (hashes(j) == h && lens(j) == tl &&
              ByteArrayMethods.arrayEquals(
                base, off + from, base, off + starts(j), tl.toLong)) dup = true
            j += 1
          }
          if (!dup) { starts(n) = from; lens(n) = tl; hashes(n) = h; n += 1 }
        }
      }
    }

    def contains(oBase: AnyRef, oOff: Long, from: Int, tl: Int, h: Long): Boolean = {
      var j = 0
      while (j < n) {
        if (hashes(j) == h && lens(j) == tl &&
          ByteArrayMethods.arrayEquals(
            oBase, oOff + from, base, off + starts(j), tl.toLong)) return true
        j += 1
      }
      false
    }
  }

  def overlap(a: UTF8String, b: UTF8String): Double = {
    val ta = new Toks(a.getBaseObject, a.getBaseOffset, a.numBytes)
    val tb = new Toks(b.getBaseObject, b.getBaseOffset, b.numBytes)
    ta.tokenize()
    tb.tokenize()
    val da = ta.n + (if (ta.hasEmpty) 1 else 0)
    val db = tb.n + (if (tb.hasEmpty) 1 else 0)
    val denom = math.max(da, db)
    if (denom == 0) return 0.0 // unreachable (split always yields >= 1 token)
    var shared = if (ta.hasEmpty && tb.hasEmpty) 1 else 0
    var j = 0
    while (j < tb.n) {
      if (ta.contains(tb.base, tb.off, tb.starts(j), tb.lens(j), tb.hashes(j))) shared += 1
      j += 1
    }
    shared.toDouble / denom
  }
}
