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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, className, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
}

object GraftExtensions {
  // arity check in the builder: `SELECT max_multiplicity()` must fail as
  // a readable analysis error, not a NoSuchElementException on children.head
  private def checked(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = children => {
    if (children.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> name, "expectedNum" -> n.toString,
        "actualNum" -> children.length.toString, "docroot" -> "-"))
    build(children)
  }

  /** (name, impl class, arity-checked builder) — shared by the extension
    * inject and [[registerAll]] so both SQL entry points get the checks. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("doc_fingerprint", classOf[Fingerprint].getName,
      checked("doc_fingerprint", 1)(c => Fingerprint(c.head))),
    ("float_vec_dot", classOf[FloatVecDot].getName,
      checked("float_vec_dot", 2)(c => FloatVecDot(c.head, c(1)))),
    ("max_multiplicity", classOf[MaxMultiplicity].getName,
      checked("max_multiplicity", 1)(c => MaxMultiplicity(c.head))))

  /** Runtime equivalent of the extension for an already-built session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
