package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-query RRF fusion — sum the lists' micros-rounded contributions
  * per doc and cut the top k — as one codegen-participating kernel call
  * over the collected per-query contribution array, replacing the
  * groupBy(query_id, doc_id) exchange + per-query rank window exchange
  * of the unrolled form (kept as `HybridRetrieval.fuseUnrolled`, the
  * equivalence witness). The input is query-bounded BY CONSTRUCTION:
  * ≤ 2·kList rows per query (each list contributes ≤ kList), so the
  * per-row work is a ≤40-entry hash-sum + sort — the exchanges were the
  * only cost, at every data scale.
  *
  * Exact replication of the unrolled form's semantics:
  *   - rrf_micros = Σ c over the doc's rows — Long adds, order-free;
  *   - rank by (rrf_micros DESC, doc_id ASC) — the window's total order;
  *   - keep rank ≤ k (fewer than k docs → fewer rows, as the filter did).
  */
private[graft] object RrfKernel {

  /** `ta`: array<struct<doc_id: long, c: long>> — one entry per
    * (list, doc) contribution of one query. */
  def fuse(ta: ArrayData, k: Int): ArrayData = {
    val n = ta.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val sums = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) {
      val r = ta.getStruct(i, 2)
      val doc = java.lang.Long.valueOf(r.getLong(0))
      val c = r.getLong(1)
      val prev = sums.get(doc)
      sums.put(doc, if (prev == null) c else prev.longValue() + c)
      i += 1
    }
    val entries = new Array[(Long, Long)](sums.size())
    val it = sums.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    // (rrf_micros DESC, doc_id ASC) — the rank window's total order
    val sorted = entries.sortWith { case ((d1, s1), (d2, s2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2)
    }
    val m = math.min(k, sorted.length)
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = new GenericInternalRow(
        Array[Any]((i + 1).toLong, sorted(i)._1, sorted(i)._2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The per-query RRF fuse + top-k cut as one expression over the
  * collected tagged-contribution array. */
case class RrfFuse(tArr: Expression, k: Int) extends UnaryExpression {

  override def child: Expression = tArr
  override def prettyName: String = "rrf_fuse"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("rrf_micros", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(t: Any): Any =
    RrfKernel.fuse(t.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RrfKernel.fuse($t, $k);")

  override protected def withNewChildInternal(newChild: Expression): RrfFuse =
    copy(tArr = newChild)
}

object RrfFuse {
  def rrfFuse(ta: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      RrfFuse(org.apache.spark.sql.graftshim.GraftShims.expression(ta), k))
}
