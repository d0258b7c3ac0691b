package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Max multiplicity of any element in a string array — the per-row core of
  * the repetition quality signals (count of the most frequent token /
  * n-gram).
  *
  * A native Catalyst `Expression` with `doGenCode`: the generated code
  * makes ONE static call per row into [[MaxMultiplicity.compute]], which
  * sorts the row's elements (any total order groups equals together —
  * binary UTF8String order here) and scans the longest equal run. That
  * keeps the operator inside whole-stage codegen with primitive `long`
  * outputs — no boxing, no interpreted higher-order-function evaluation.
  *
  * This replaced a builtin `aggregate(sequence(...))` fold over a
  * pre-sorted array column: same O(n log n) per row asymptotics, but the
  * fold was interpreted (Spark lambda functions don't codegen) and its
  * per-element expression-tree walk dominated the scan stage — measured
  * ~1.4× faster end-to-end at sf0.1 and ~3× at ×10–×20 volumes, where
  * the interpreted overhead stopped amortizing (SCALE.md).
  *
  * Semantics match the DuckDB oracle's `unnest → GROUP BY → MAX(count)`:
  * multiplicity counting needs no particular order, only grouping. NULL
  * elements (never produced by `split`/`transform` here) would sort
  * together and count as one group, same as GROUP BY.
  */
case class MaxMultiplicity(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "max_multiplicity"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_multiplicity needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MaxMultiplicity.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaxMultiplicity.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicity =
    copy(child = newChild)
}

object MaxMultiplicity {

  /** Called once per row from generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n <= 1) return n.toLong
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    // nulls-first total order; any total order groups equal elements
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) =>
      if (x eq y) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.compareTo(y))
    var best = 1L
    var cur = 1L
    i = 1
    while (i < n) {
      val same =
        if (a(i) == null) a(i - 1) == null
        else a(i).equals(a(i - 1))
      cur = if (same) cur + 1 else 1
      if (cur > best) best = cur
      i += 1
    }
    best
  }

  def maxMultiplicity(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      MaxMultiplicity(org.apache.spark.sql.graftshim.GraftShims.expression(c)))
}
