package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap over the ordering key, so a
  * partition holds AT MOST k (ord, payload) pairs per group at any moment.
  */
final class TopKState(val k: Int, val ordering: Ordering[Any]) {
  // Reversed ordering: PriorityQueue dequeues its max, so with the reverse
  // comparator the head is the SMALLEST kept pair — the eviction candidate.
  private[functions] val heap =
    mutable.PriorityQueue.empty[(Any, Any)](new Ordering[(Any, Any)] {
      def compare(a: (Any, Any), b: (Any, Any)): Int = ordering.compare(b._1, a._1)
    })

  def insert(o: Any, p: Any): Unit = {
    if (heap.size < k) heap.enqueue((o, p))
    else if (ordering.compare(o, heap.head._1) > 0) {
      heap.dequeue(); heap.enqueue((o, p)); ()
    }
  }

  def pairs: Seq[(Any, Any)] = heap.toSeq

  /** Kept pairs, LARGEST ordering key first. */
  def sortedDesc: Seq[(Any, Any)] =
    heap.toSeq.sorted(new Ordering[(Any, Any)] {
      def compare(a: (Any, Any), b: (Any, Any)): Int = ordering.compare(b._1, a._1)
    })
}

/** `topk_by(payload, ord, k)` — per-group top-k WITHOUT a sort: returns the
  * k payload values with the LARGEST `ord` keys, descending.
  *
  * This is the scale-path replacement for the `row_number() OVER (PARTITION
  * BY g ORDER BY ...) <= k` idiom: the window form shuffles EVERY candidate
  * row to its group's reducer and sorts the whole partition (a KNN corpus of
  * N vectors x Q queries moves N*Q rows); this TypedImperativeAggregate
  * keeps a size-k min-heap per group per partition, so map-side partial
  * aggregation ships at most k rows per group per partition and nothing is
  * ever sorted beyond the final k elements.
  *
  * Determinism: make `ord` a TOTAL order (break ties inside the key, e.g.
  * `struct(cos, -id)`) — equal keys otherwise keep an arbitrary winner.
  * Rows with a null `ord` are ignored; with fewer than k rows the array is
  * short; an empty group yields an empty array.
  */
case class TopKByExpr(
    payload: Expression,
    ord: Expression,
    k: Int,
    asc: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  override def children: Seq[Expression] = Seq(payload, ord)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)
  override def prettyName: String = if (asc) "bottomk_by" else "topk_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_by k must be positive, got $k")
    else if (!RowOrdering.isOrderable(ord.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by ordering type ${ord.dataType.catalogString} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  // asc=true flips the comparator: the heap then keeps the k SMALLEST keys
  // and eval emits them ascending — `bottomk_by`, needed when "best" means
  // smallest (e.g. ordering by (-score, id) with a STRING id, which cannot
  // be negated for the max-variant's tie-break; ADVICE r2 #2) and for
  // bounded lineage sampling (smallest-N member ids per cluster).
  @transient private lazy val ordering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(ord.dataType)
    if (asc) base.reverse else base
  }
  @transient private lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](ord.dataType, payload.dataType))

  override def createAggregationBuffer(): TopKState = new TopKState(k, ordering)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val o = ord.eval(input)
    if (o != null) {
      // eval results may be views into reused row buffers — copy before keeping
      buf.insert(InternalRow.copyValue(o), InternalRow.copyValue(payload.eval(input)))
    }
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    other.pairs.foreach { case (o, p) => buf.insert(o, p) }
    buf
  }

  override def eval(buf: TopKState): Any =
    new GenericArrayData(buf.sortedDesc.map(_._2).toArray)

  override def serialize(buf: TopKState): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    val row = new GenericInternalRow(2)
    buf.pairs.foreach { case (o, p) =>
      row.update(0, o)
      row.update(1, p)
      val bytes = pairProj(row).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val state = new TopKState(k, ordering)
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    while (dis.available() > 0) {
      val n = dis.readInt()
      val rowBytes = new Array[Byte](n)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, n)
      // rowBytes is freshly allocated and owned by this row — views are safe
      state.insert(row.get(0, ord.dataType), row.get(1, payload.dataType))
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(payload = newChildren(0), ord = newChildren(1))
}
