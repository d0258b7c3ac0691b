package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._

/** Fused vector kernels for the similarity tiers — each replaces an
  * `aggregate(zip_with(...))` / `transform(...)` higher-order composite
  * that Spark evaluates interpreted (per-element lambda dispatch outside
  * whole-stage codegen). Every kernel keeps the EXACT operation order of
  * the declarative form it replaces — left-to-right double accumulation,
  * identical casts — so values are bit-identical (the [[FloatVecDot]]
  * contract, extended to the remaining shapes). Length-mismatched inputs
  * return NULL, matching zip_with's null-padding poisoning the fold.
  */
private[graft] object VecKernels {

  /** Σ x_i·v_i over a float-array column and a LITERAL double vector —
    * the centroid-assignment / LUT hot loop. */
  def litDot(x: ArrayData, v: Array[Double]): java.lang.Double = {
    if (x.numElements() != v.length) return null
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += x.getFloat(i).toDouble * v(i); i += 1 }
    acc
  }

  /** Σ a_i·b_i, a float[], b double[] — the asymmetric (query × decoded)
    * numerator. */
  def mixedDot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }

  /** Σ a_i·b_i over two double[] columns. */
  def doubleDot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** SQ8 encode: clamp₀²⁵⁵ floor((x_d − mn_d)·scale_d + 0.5) per
    * dimension (scale 0 for degenerate dims) — the exact integer/cast
    * order of `greatest(0, least(255, floor(...).cast(int)))`. */
  def sq8Encode(x: ArrayData, mn: Array[Double], scale: Array[Double]): ArrayData = {
    val n = x.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      // (int) of the floored double saturates like Spark's non-ANSI cast;
      // the 0..255 clamp then matches greatest/least on ints
      val v = (Math.floor((x.getFloat(i).toDouble - mn(i)) * scale(i) + 0.5)).toInt
      out(i) = if (v < 0) 0 else if (v > 255) 255 else v
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** SQ8 decode: mn_d + code_d·inv_d per dimension. */
  def sq8Decode(codes: ArrayData, mn: Array[Double], inv: Array[Double]): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = mn(i) + codes.getInt(i).toDouble * inv(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `aggregate(zip_with(e, lit(v), (x,p) => x.cast(double)*p), 0d, +)` as
  * one codegen-participating kernel call. */
case class LitVecDot(child: Expression, v: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "lit_vec_dot"

  override def nullSafeEval(input: Any): Any =
    VecKernels.litDot(input.asInstanceOf[ArrayData], v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("litVec", v, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Double r = graft.functions.VecKernels.litDot($c, $vRef);
       |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LitVecDot =
    copy(child = newChild)
}

/** float[] × double[] dot (see [[VecKernels.mixedDot]]). */
case class MixedVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "mixed_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.mixedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Double r = graft.functions.VecKernels.mixedDot($a, $b);
       |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MixedVecDot =
    copy(left = newLeft, right = newRight)
}

/** double[] × double[] dot (see [[VecKernels.doubleDot]]). */
case class DoubleVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.doubleDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Double r = graft.functions.VecKernels.doubleDot($a, $b);
       |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}

/** The SQ8 encode transform as one kernel call (scan-fused, stats as
  * reference objects). */
case class Sq8EncodeExpr(child: Expression, mn: Array[Double], scale: Array[Double])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(input: Any): Any =
    VecKernels.sq8Encode(input.asInstanceOf[ArrayData], mn, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mn", mn, "double[]")
    val scRef = ctx.addReferenceObj("sq8Scale", scale, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernels.sq8Encode($c, $mnRef, $scRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8EncodeExpr =
    copy(child = newChild)
}

/** The SQ8 decode transform as one kernel call. */
case class Sq8DecodeExpr(child: Expression, mn: Array[Double], inv: Array[Double])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_decode"

  override def nullSafeEval(input: Any): Any =
    VecKernels.sq8Decode(input.asInstanceOf[ArrayData], mn, inv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mn", mn, "double[]")
    val invRef = ctx.addReferenceObj("sq8Inv", inv, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecKernels.sq8Decode($c, $mnRef, $invRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8DecodeExpr =
    copy(child = newChild)
}

object VecExprs {
  def litDot(e: Column, v: Array[Double]): Column =
    GraftShims.column(LitVecDot(GraftShims.expression(e), v))

  def mixedDot(a: Column, b: Column): Column =
    GraftShims.column(MixedVecDot(GraftShims.expression(a), GraftShims.expression(b)))

  def doubleDot(a: Column, b: Column): Column =
    GraftShims.column(DoubleVecDot(GraftShims.expression(a), GraftShims.expression(b)))

  def sq8Encode(e: Column, mn: Array[Double], scale: Array[Double]): Column =
    GraftShims.column(Sq8EncodeExpr(GraftShims.expression(e), mn, scale))

  def sq8Decode(codes: Column, mn: Array[Double], inv: Array[Double]): Column =
    GraftShims.column(Sq8DecodeExpr(GraftShims.expression(codes), mn, inv))
}
