package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** The full 60-bit SimHash signature in ONE pass over a document's
  * hashed-token array (multiplicity preserved — a repeated token weighs
  * more, the standard SimHash weighting): per bit i,
  * `sum_tokens(±1 on hash bit i)`, then the signature assembles the
  * positive-sum bits.
  *
  * Bit-identical to the aggregate formulation (60 conditional SUM columns
  * + sign assembly) the DuckDB oracle mirrors — but evaluated per ROW, so
  * the signature stage needs NO token explode and NO corpus-wide
  * 60-column hash aggregate: at 100 TB that was a shuffle of every token
  * occurrence; now it fuses into the scan. Sums are Long (a single
  * document would need 2⁶³ tokens to wrap).
  *
  * A native Catalyst `Expression` with `doGenCode` — the token × 60-bit
  * double loop inlines into whole-stage codegen. An empty array yields
  * signature 0; callers exclude token-less docs, as the aggregate form
  * did implicitly (no rows → no group). */
case class SimHash60(child: Expression) extends UnaryExpression {

  private val Bits = 60

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Long](Bits)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var i = 0
      while (i < Bits) {
        sums(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (sums(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sums = ctx.freshName("sums")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sums = new long[$Bits];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $Bits; $i++) {
         |    $sums[$i] += ((($h >> $i) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $Bits; $i++) {
         |  if ($sums[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def simhash60(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      SimHash60(org.apache.spark.sql.graftshim.GraftShims.expression(c)))
}
