package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
  * not a window rank): the aggregation buffer is a bounded TreeSet of ≤k
  * longs, so the PARTIAL phase runs map-side and each partition ships k
  * longs per group to the exchange — the full distinct key set never
  * shuffles, which is the entire point of sketching. (A `row_number ≤ k`
  * window would shuffle every distinct hash; `collect_set` would hold
  * unbounded per-group state.) Inserts into a full buffer first compare
  * against the current max — O(1) rejection for the overwhelming majority
  * of rows once the buffer saturates.
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
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
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

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) {
      buf.add(h)
    } else if (h < buf.last()) {
      // strictly below the current max: admit, then re-trim to k.
      // (TreeSet.add dedupes, so a re-seen hash never shrinks the set.)
      if (buf.add(h)) buf.pollLast()
    } // h >= max of a full buffer: cannot be among the k smallest
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    // other iterates ascending; once it exceeds a full buffer's max, no
    // later element of it can be admitted either
    val it = other.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val h = it.next().longValue()
      if (buf.size >= k && h >= buf.last()) continue = false
      else insert(buf, h)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
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
