package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All MinHash signature values in ONE pass over a document's hashed
  * shingle array: for each universal-hash (a_i, b_i), the min of
  * `(ha·a_i + b_i) mod p` over the array, `ha = h mod p`, p = 2³¹−1.
  *
  * Bit-identical to the aggregate formulation
  * `groupBy(doc).agg(min(pmod(ha*a_i + b_i, p)) ...)` the DuckDB oracle
  * mirrors — but evaluated per ROW over an array column, so the signature
  * stage needs NO explode, NO distinct shuffle, and NO 64-column
  * hash-aggregate: it fuses into the scan of the (pinned) shingle-array
  * table. p = 2³¹−1 with a,b < 2³¹ keeps every product below 2⁶² — exact
  * Long arithmetic, same argument as the aggregate form.
  *
  * A native Catalyst `Expression` with `doGenCode` — the double loop
  * (shingles × hash functions) inlines into whole-stage codegen. Empty
  * arrays yield all-p sentinels; callers exclude empty-shingle docs, as
  * the aggregate form did implicitly (no rows → no group). */
case class MinHashAll(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {

  private val P = 2147483647L
  // a/b reduced mod p ONCE — they are loop-invariant in the hot
  // (shingles × hash functions) double loop of both evaluation paths
  @transient private lazy val ar: Array[Long] = as.map(_ % P)
  @transient private lazy val br: Array[Long] = bs.map(_ % P)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_all"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = ar.length
    val mins = Array.fill(n)(P)
    var j = 0
    while (j < arr.numElements()) {
      val ha = ((arr.getLong(j) % P) + P) % P
      var i = 0
      while (i < n) {
        val v = (ha * ar(i) + br(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", ar, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", br, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val ha = ctx.freshName("ha")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$asRef.length];
         |java.util.Arrays.fill($mins, ${P}L);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $ha = (($c.getLong($j) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $i = 0; $i < $asRef.length; $i++) {
         |    long $v = ($ha * $asRef[$i] + $bsRef[$i]) % ${P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashAll =
    copy(child = newChild)
}

object MinHashAll {
  def minhashAll(c: Column, params: Array[(Long, Long)]): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      MinHashAll(org.apache.spark.sql.graftshim.GraftShims.expression(c),
        params.map(_._1), params.map(_._2)))
}
