package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable rounding: `floor(x·10ˢ + 0.5) / 10ˢ` — three IEEE
  * double operations that every engine computes identically.
  *
  * Native `round(x, s)` is NOT cross-engine stable for arbitrary doubles:
  * Spark rounds the shortest decimal string HALF_UP while DuckDB scales in
  * binary, so values at shortest-repr ties (e.g. the double printed as
  * 0.1234565) round differently and break bit-exact oracle comparison.
  * The floor form sidesteps engine rounding entirely; its tie behavior
  * (toward +∞) differs from both natives, but it is the SAME on both
  * sides, which is the property the oracles need.
  *
  * SQL twin for oracles: `FLOOR(x * 1e{s} + 0.5) / 1e{s}`.
  */
object StableRound {
  def stableRound(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }

  /** The matching DuckDB SQL fragment. */
  def sql(expr: String, scale: Int): String =
    s"FLOOR(($expr) * 1e$scale + 0.5) / 1e$scale"

  /** Exact integer micro-units of a double value (floor-form, ×10⁶) — for
    * order-independent exact summation of money/measure doubles. */
  def microsLong(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")

  def microsLongSql(expr: String): String =
    s"CAST(FLOOR(($expr) * 1e6 + 0.5) AS BIGINT)"

  /** Scala-side twin for row-at-a-time code (stateful sessionization). */
  def microsOf(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
}
