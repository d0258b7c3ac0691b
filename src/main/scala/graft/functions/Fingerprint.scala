package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint:
  *   h = Σ codepoint(c_i) · 31^i  (mod 1_000_000_007)
  * computed left-to-right as h = (h·31 + c) mod p over UTF-8 code units.
  *
  * A native Catalyst `Expression` with `doGenCode` (not a Scala UDF): the
  * loop inlines into whole-stage codegen, so fingerprinting a 100 TB
  * document table adds no virtual-call or serialization overhead — this is
  * the (b) tier of the custom-operator preference order (compose > custom
  * Expression > custom plan > mapPartitions).
  *
  * The modulus keeps the value well inside Long range (no overflow
  * semantics to match across engines) and the mixing constant 31 is the
  * classic polynomial rolling base.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  // Spark 4 classic API: Column is node-backed; wrap/unwrap via the shim
  def docFingerprint(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      Fingerprint(org.apache.spark.sql.graftshim.GraftShims.expression(c)))

  /** Scala reference implementation for tests. */
  def reference(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      h = (h * 31 + (b & 0xff)) % 1000000007L
    h
  }

  /** The ONE DuckDB twin of the fingerprint fold, as an expression over a
    * SQL text column — the same h = (h·31 + byte) mod 1e9+7 left fold over
    * the UTF-8 BYTES, built from the hex dump (two hex chars per byte) and
    * `list_reduce`, seeded with a prepended 0 so empty text folds to 0
    * like the expression's empty loop. Interpolated by every oracle that
    * surfaces a fingerprint (text_fingerprint, corpus_ingest_stream) so
    * the fold cannot drift between them. */
  def fingerprintSql(textCol: String): String =
    s"""list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           [CAST('0x' || substr(hex(encode($textCol)), 2*x - 1, 2) AS BIGINT)
       |            FOR x IN range(1, CAST(octet_length(encode($textCol)) AS INTEGER) + 1)]),
       |         (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin
}
