package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The KMV aggregation buffer: an ascending primitive `long[]` of the ≤k
  * smallest distinct hashes seen (r17 ADVICE: the first cut was a
  * `java.util.TreeSet[java.lang.Long]`, which boxed every hash and paid
  * tree rebalancing on the per-row hot path of an aggregate positioned as
  * the 100 TB COUNT(DISTINCT) replacement). A flat sorted array is the
  * right structure for this access pattern:
  *
  *   - once saturated — the steady state, after the first k distinct rows
  *     of a group — the overwhelming majority of inputs fail the single
  *     primitive `h >= max` compare and cost O(1), no allocation;
  *   - an admitted insert is binary search + one `System.arraycopy` shift
  *     over ≤k contiguous longs (cache-friendly; k is 128-256 here, and
  *     admissions decay as ~k/n);
  *   - merge walks the other buffer ascending with the same early exit the
  *     TreeSet version had: past a full buffer's max, no later element of
  *     an ascending source can be admitted.
  */
final class KmvBuffer(val k: Int) {
  /** Ascending; the first [[size]] slots are valid. */
  val arr = new Array[Long](k)
  var size = 0

  def isFull: Boolean = size == k
  def max: Long = arr(size - 1)

  /** Insert h iff it belongs among the k smallest distinct values. */
  def insert(h: Long): Unit = {
    if (size == k && h >= arr(k - 1)) return // saturated fast path: O(1)
    val i = java.util.Arrays.binarySearch(arr, 0, size, h)
    if (i >= 0) return // already present (the sketch is a SET)
    val at = -(i + 1)
    // shift the tail right by one; a full buffer sheds its current max
    val moved = math.min(size, k - 1) - at
    if (moved > 0) System.arraycopy(arr, at, arr, at + 1, moved)
    arr(at) = h
    if (size < k) size += 1
  }

  /** Merge another buffer's (ascending) contents. */
  def mergeFrom(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.size && !(size == k && other.arr(i) >= arr(k - 1))) {
      insert(other.arr(i))
      i += 1
    }
  }
}

/** KMV (k-minimum-values) distinct-cardinality sketch: the k smallest
  * DISTINCT hash values of a group, as an ascending `array<long>`.
  *
  * The sketch is the 100 TB form of `COUNT(DISTINCT …)`: the estimator
  * `(k−1)·M / h₍ₖ₎` (hashes uniform on [0, M)) answers "how many distinct
  * shingles / urls / docs per source" from k longs of state instead of a
  * corpus-wide distinct shuffle, with expected relative error ~1/√(k−2)
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"). Two sketches MERGE losslessly — bottomₖ(A ∪ B) =
  * bottomₖ(bottomₖ(A) ∪ bottomₖ(B)) — so union cardinalities (and, via
  * inclusion–exclusion, overlap estimates between corpus slices) come
  * from already-computed per-slice sketches without touching the data
  * again.
  *
  * A native Catalyst `TypedImperativeAggregate` (not collect_set + slice,
  * not a window rank): the aggregation buffer is a bounded [[KmvBuffer]]
  * of ≤k primitive longs, so the PARTIAL phase runs map-side and each
  * partition ships k longs per group to the exchange — the full distinct
  * key set never shuffles, which is the entire point of sketching. (A
  * `row_number ≤ k` window would shuffle every distinct hash;
  * `collect_set` would hold unbounded per-group state.) Inserts into a
  * full buffer first compare against the current max — O(1) rejection for
  * the overwhelming majority of rows once the buffer saturates.
  *
  * Determinism: the value is a pure set function of the input hashes —
  * no RNG, no order dependence — so a DuckDB oracle computes the
  * identical array with `row_number() OVER (ORDER BY h) ≤ k` over distinct
  * hashes at test scale, keeping the sketch gates hash-exact.
  *
  * Input must be non-negative longs (graft uses [[graft.operators.Dedup.hash60]],
  * range [0, 2⁶⁰)); nulls are ignored like every SQL aggregate.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_bottom_k needs k >= 2, got $k")
  // input contract (not ExpectsInputTypes — AbstractDataType is
  // private[sql]): the child must be LongType, checked here
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_bottom_k needs a LONG input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_bottom_k"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.arr, buf.size))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    // serialized form is ascending + distinct + ≤k long: fill directly
    while (bb.remaining() >= 8 && buf.size < buf.k) {
      buf.arr(buf.size) = bb.getLong()
      buf.size += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}

object KmvSketch {
  /** Hash range of [[graft.operators.Dedup.hash60]]: [0, 2⁶⁰). */
  val HashRange: Long = 1L << 60

  def kmvBottomK(c: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      KmvBottomK(org.apache.spark.sql.graftshim.GraftShims.expression(c), k)
        .toAggregateExpression())

  /** Scala reference implementation for tests. */
  def reference(hashes: Iterable[Long], k: Int): Seq[Long] =
    hashes.toSeq.distinct.sorted.take(k)
}
