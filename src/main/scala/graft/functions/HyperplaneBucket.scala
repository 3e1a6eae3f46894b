package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `hyperplane_bucket(emb, bits, table)` — sign-bit LSH bucket id from
  * `bits` deterministic random hyperplanes, one fused pass over the vector.
  *
  * Native twin of the HOF formulation in
  * `SimilaritySearch.hyperplaneBucketHof` (bit-identical output, pinned in
  * FunctionsSpec): plane component for (table, plane p, dim i) =
  * `(pmod(xxhash64(table, p, i, "hyperplane"), 2000001) - 1000000) / 1e6`,
  * bucket bit p = sign of the left-to-right dot product. The HOF form
  * builds `bits` nested aggregate-over-zip_with trees evaluated
  * interpreted per row — at 24 bits x 4 tables that tree dominated
  * er_cosine_dedup / er_ann_ivf; here the planes are computed once into a
  * process-wide cache and each row is a tight fused loop.
  */
case class HyperplaneBucketExpr(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (bits <= 0 || bits > 63)
      TypeCheckResult.TypeCheckFailure(s"hyperplane_bucket bits must be in [1,63], got $bits")
    else if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires array<float|double>, got ${child.dataType}")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneBucketOp.bucket(v.asInstanceOf[ArrayData], isFloat, bits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucketOp.bucket($c, $isFloat, $bits, $table)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucketOp {
  private val STR = "hyperplane".getBytes("UTF-8")
  private val MOD = 2000001L
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  /** Plane component, exactly the Column formulation:
    * (pmod(xxhash64(t, p, i, "hyperplane"), 2000001) - 1000000) / 1e6 with
    * xxhash64's default seed 42 folded left over the four arguments. */
  def component(table: Int, p: Int, i: Int): Double = {
    var h = XXH64.hashInt(table, 42L)
    h = XXH64.hashInt(p, h)
    h = XXH64.hashInt(i, h)
    h = XXH64.hashUnsafeBytes(STR, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      STR.length, h)
    val pm = ((h % MOD) + MOD) % MOD
    (pm - 1000000L).toDouble / 1000000.0
  }

  /** Plane vector for (table, p), grown on demand; concurrent re-computes
    * are idempotent so the race is benign. */
  private def plane(table: Int, p: Int, minLen: Int): Array[Double] = {
    val key = (table.toLong << 32) | (p.toLong & 0xffffffffL)
    var arr = cache.get(key)
    if (arr == null || arr.length < minLen) {
      val n = math.max(minLen, 128)
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = component(table, p, i); i += 1 }
      cache.put(key, a)
      arr = a
    }
    arr
  }

  /** Bucket id. A vector containing a null element yields bucket 0 —
    * EXACTLY the HOF twin's behavior: the null poisons the dot product,
    * `when(dot >= 0, bit).otherwise(0)` takes the otherwise branch for
    * every plane, and the bit sum is 0 (pinned in FunctionsSpec). */
  def bucket(ad: ArrayData, isFloat: Boolean, bits: Int, table: Int): Long = {
    val n = ad.numElements()
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i)) return 0L
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < bits) {
      val pl = plane(table, p, n)
      var acc = 0.0
      i = 0
      if (isFloat) {
        while (i < n) { acc += ad.getFloat(i).toDouble * pl(i); i += 1 }
      } else {
        while (i < n) { acc += ad.getDouble(i) * pl(i); i += 1 }
      }
      if (acc >= 0) out |= (1L << p)
      p += 1
    }
    out
  }
}
