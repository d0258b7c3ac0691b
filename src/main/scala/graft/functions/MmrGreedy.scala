package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The k greedy MMR selection steps over ONE query's candidate/sim
  * arrays, as a single codegen-participating kernel call — replacing the
  * k−1 unrolled DataFrame stages (each: anti-join remaining + sims join +
  * selected join + max-aggregate + rank window + union + pin), whose wall
  * time was pure stage-count at every data scale (the per-query work is
  * kList ≤ 20 candidates and kList² sims BY CONSTRUCTION — r20 measured
  * the unrolled form at 6.8 s for 8 queries at sf0.1).
  *
  * Exact replication of the unrolled form's semantics, step by step:
  *   - step 1: argmax of rel·λ10 over ALL candidates, ties → smaller id;
  *     maxsim = 0.
  *   - step t: a candidate is eligible iff not yet picked AND it has at
  *     least one sim row against a picked id (the unrolled form's INNER
  *     sims⋈selected join dropped sim-less candidates for that step);
  *     maxsim = MAX over its sim rows to picked ids (duplicate sim rows
  *     fold by max, as the groupBy-max did); score = rel·λ10 −
  *     maxsim·(10−λ10); argmax, ties → smaller id.
  *   - picked identity is the neighbor ID (the anti-join key), so
  *     duplicate candidate rows cannot be re-picked.
  *   - fewer than k pickable candidates → fewer picks (the unrolled form
  *     emitted nothing for an empty step).
  * All arithmetic is Long — identical integer math, no ordering or
  * rounding freedom anywhere.
  */
private[graft] object MmrKernel {

  /** `ca`: array<struct<neighbor_id: long, rel_micros: long>>;
    * `sa`: array<struct<id1: long, id2: long, sim_micros: long>> —
    * sims FROM id1 TO id2 (id2 plays "selected"). */
  def greedy(ca: ArrayData, sa: ArrayData, k: Int, lambdaTenths: Int): ArrayData = {
    val n = ca.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val rels = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ca.getStruct(i, 2)
      ids(i) = r.getLong(0)
      rels(i) = r.getLong(1)
      i += 1
    }
    // sim lookup: id1 → (id2 → max sim)
    val sm = new java.util.HashMap[java.lang.Long, java.util.HashMap[java.lang.Long, java.lang.Long]]()
    var j = 0
    while (j < sa.numElements()) {
      val r = sa.getStruct(j, 3)
      val inner = sm.computeIfAbsent(r.getLong(0),
        _ => new java.util.HashMap[java.lang.Long, java.lang.Long]())
      val id2 = java.lang.Long.valueOf(r.getLong(1))
      val v = r.getLong(2)
      val prev = inner.get(id2)
      if (prev == null || v > prev.longValue()) inner.put(id2, v)
      j += 1
    }
    val lam = lambdaTenths.toLong
    val oneMinus = (10 - lambdaTenths).toLong
    val pickedIds = new scala.collection.mutable.ArrayBuffer[Long](k)
    val pickedSet = new java.util.HashSet[java.lang.Long](k * 2)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](k)

    // step 1: pure relevance, ties → smaller id
    var bi = -1
    var bs = 0L
    i = 0
    while (i < n) {
      val score = rels(i) * lam
      if (bi == -1 || score > bs || (score == bs && ids(i) < ids(bi))) { bi = i; bs = score }
      i += 1
    }
    out += new GenericInternalRow(Array[Any](1L, ids(bi), rels(bi), 0L))
    pickedIds += ids(bi)
    pickedSet.add(ids(bi))

    var t = 2
    var done = false
    while (t <= k && !done) {
      bi = -1
      bs = 0L
      var bms = 0L
      i = 0
      while (i < n) {
        if (!pickedSet.contains(ids(i))) {
          val inner = sm.get(ids(i))
          if (inner != null) {
            var ms = Long.MinValue
            var found = false
            var p = 0
            while (p < pickedIds.length) {
              val v = inner.get(pickedIds(p))
              if (v != null) {
                found = true
                if (v.longValue() > ms) ms = v.longValue()
              }
              p += 1
            }
            if (found) {
              val score = rels(i) * lam - ms * oneMinus
              if (bi == -1 || score > bs || (score == bs && ids(i) < ids(bi))) {
                bi = i; bs = score; bms = ms
              }
            }
          }
        }
        i += 1
      }
      if (bi == -1) done = true // no scorable candidate left — the empty step
      else {
        out += new GenericInternalRow(Array[Any](t.toLong, ids(bi), rels(bi), bms))
        pickedIds += ids(bi)
        pickedSet.add(ids(bi))
        t += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** The per-query MMR greedy selection as one expression over the
  * collected candidate and sim arrays. */
case class MmrGreedy(cArr: Expression, sArr: Expression, k: Int, lambdaTenths: Int)
  extends BinaryExpression {

  override def left: Expression = cArr
  override def right: Expression = sArr
  override def prettyName: String = "mmr_greedy"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pick", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("rel_micros", LongType, nullable = false),
    StructField("maxsim_micros", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(c: Any, s: Any): Any =
    MmrKernel.greedy(c.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], k, lambdaTenths)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s) =>
      s"${ev.value} = graft.functions.MmrKernel.greedy($c, $s, $k, $lambdaTenths);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MmrGreedy =
    copy(cArr = newLeft, sArr = newRight)
}

object MmrGreedy {
  def mmrGreedy(ca: Column, sa: Column, k: Int, lambdaTenths: Int): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      MmrGreedy(org.apache.spark.sql.graftshim.GraftShims.expression(ca),
        org.apache.spark.sql.graftshim.GraftShims.expression(sa), k, lambdaTenths))
}
