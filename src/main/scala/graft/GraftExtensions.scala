package graft

import graft.functions.{Fingerprint, FloatVecDot, MaxMultiplicity}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing graft's custom expressions to the
  * ad-hoc SQL surface (§3.3): with the extension installed,
  * `spark.sql("SELECT doc_fingerprint(text) ...")` and
  * `float_vec_dot(a, b)` parse like builtins — same Catalyst nodes as the
  * Column API, so SQL users get the codegen'd fused loops too.
  *
  * Install: `.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.GraftExtensions` in config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[Fingerprint].getName, "doc_fingerprint"),
      (children: Seq[Expression]) => Fingerprint(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("max_multiplicity"),
      new ExpressionInfo(classOf[MaxMultiplicity].getName, "max_multiplicity"),
      (children: Seq[Expression]) => MaxMultiplicity(children.head)))
  }
}
