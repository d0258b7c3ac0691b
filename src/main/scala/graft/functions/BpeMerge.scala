package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-pair-encoding token counting: pre-tokenize, then apply a
  * checked-in merge table until no merge applies, and count the resulting
  * merged tokens — the number a token-budget decision should be based on
  * (the round-6 `text_bpe_tokens` query counts pre-tokenizer segments,
  * which systematically over-counts: "the" is 1 BPE token, not 3 chars).
  *
  * Algorithm (identical by construction on both engines):
  *   1. segments = all matches of [[Pattern]] (the RE2-safe GPT-2-style
  *      pre-tokenizer, leftmost-first greedy — proven identical Java/RE2).
  *   2. per segment: drop any literal U+001F (the internal separator must
  *      not be data), then WRAP each code point in separators:
  *      "the" → "␟t␟␟h␟␟e␟" — every token is `␟tok␟`, tokens abut as `␟␟`.
  *   3. for each merge (a,b) in rank order: textual replace of "␟a␟␟b␟"
  *      with "␟ab␟" — all occurrences, left-to-right non-overlapping (Java
  *      `String.replace` == DuckDB `replace`).
  *   4. merged token count = (number of separators) / 2.
  *
  * Why the DOUBLE-separator wrap (and not a bare trailing separator): the
  * search key must be anchored on BOTH token boundaries. Every token is
  * exactly `␟tok␟` with no separator inside `tok`, so "␟a␟␟b␟" can only
  * match two complete adjacent tokens equal to a and b — never a SUFFIX of
  * a longer token (with trailing-only separators, "e␟d␟" would match inside
  * "re␟d␟" and wrongly fuse [re,d] into one token). And because adjacent
  * keys share no characters (`␟a␟␟b␟` ends where `␟b␟␟c␟` begins only at a
  * fresh `␟`), one non-overlapping left-to-right pass replaces EVERY
  * disjoint occurrence — including back-to-back pairs like "a b a b".
  *
  * Equivalence with the classic min-rank BPE encode loop ("repeatedly merge
  * the lowest-rank adjacent pair, leftmost first"): [[Merges]] is
  * TOPOLOGICALLY ordered — every multi-character element is the output of
  * an earlier merge (checked at class-init). A rank-r replacement creates
  * only pairs containing r's output token, whose merge rank (if any) is
  * > r; and a single left-to-right pass leaves no rank-r pair behind (a
  * surviving adjacent (a,b) would have been matched when the scan reached
  * it, unless one side was consumed — in which case that side is no longer
  * the token a or b). So the minimum applicable rank never decreases, and
  * one sequential rank-order sweep equals the min-rank fixpoint. Verified
  * in Round8Spec against an independent one-merge-at-a-time min-rank
  * encoder, including the "red" suffix counterexample. Ours is
  * hand-distilled from common English bigram statistics in GPT-2-merge
  * style (space-prefixed word starts).
  *
  * The expression is a native Catalyst `Expression` with `doGenCode` making
  * ONE static call per row ([[MaxMultiplicity]] mold) — stays inside
  * whole-stage codegen, primitive long output, zero shuffles.
  */
case class BpeMergeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_merge_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_tokens needs string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    BpeMerge.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeMerge.countTokens($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): BpeMergeTokens =
    copy(child = newChild)
}

object BpeMerge {

  /** Shared whitespace class — explicit, not `\s`: Java's `\s` includes
    * U+000B, RE2's does not (round-5 cross-engine finding). */
  val Ws = "[\\t\\n\\f\\r ]"

  /** The RE2-safe GPT-2-style pre-tokenizer (same segment classes, no
    * PCRE-only lookahead): optionally-space-prefixed letter runs, digit
    * runs, punctuation runs, residual whitespace. Single-sourced — the
    * `text_bpe_tokens` gate, this merge counter, and both DuckDB oracles
    * all interpolate THIS string. */
  val Pattern =
    s" ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\t\\n\\f\\r \\p{L}\\p{N}]+|$Ws+"

  /** Internal token separator (U+001F); stripped from input first so it can
    * never collide with data. */
  val Sep = '\u001f'
  val SepStr: String = Sep.toString

  /** The checked-in merge table, rank order = application order. Distilled
    * English bigram merges in GPT-2 style (word-initial tokens carry their
    * leading space). TOPOLOGICAL: every multi-char element is produced by
    * an earlier merge — validated below; see the class scaladoc for why
    * that makes the sequential sweep equal the min-rank encode. */
  val Merges: Vector[(String, String)] = Vector(
    "t" -> "h",     // 1  th
    "i" -> "n",     // 2  in
    "a" -> "n",     // 3  an
    "e" -> "r",     // 4  er
    "o" -> "n",     // 5  on
    "r" -> "e",     // 6  re
    "e" -> "n",     // 7  en
    "e" -> "s",     // 8  es
    "o" -> "r",     // 9  or
    "a" -> "t",     // 10 at
    "a" -> "l",     // 11 al
    "i" -> "t",     // 12 it
    "o" -> "u",     // 13 ou
    "th" -> "e",    // 14 the
    "an" -> "d",    // 15 and
    "in" -> "g",    // 16 ing
    "e" -> "d",     // 17 ed
    "i" -> "s",     // 18 is
    "o" -> "f",     // 19 of
    "t" -> "o",     // 20 to
    " " -> "the",   // 21 · the
    " " -> "and",   // 22 · and
    " " -> "of",    // 23 · of
    " " -> "to",    // 24 · to
    "er" -> "s",    // 25 ers
    "at" -> "i",    // 26 ati
    "ati" -> "on",  // 27 ation
    " " -> "a",     // 28 · a
    "es" -> "t",    // 29 est
    "ou" -> "r")    // 30 our

  // topological validation: a multi-char element must be an earlier output
  // — the property the sequential-sweep ≡ min-rank-encode argument rests on
  locally {
    val produced = scala.collection.mutable.Set.empty[String]
    Merges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).foreach { e =>
        require(e.codePointCount(0, e.length) == 1 || produced.contains(e),
          s"merge ${i + 1} ($a,$b): element '$e' is neither a single " +
            "character nor an earlier merge's output — table not topological")
      }
      produced += a + b
    }
  }

  // precomputed literal search/replacement pairs for the sweep — both
  // boundary-anchored: a token is exactly ␟tok␟, so ␟a␟␟b␟ matches only
  // two complete adjacent tokens (never a suffix of a longer token)
  private val searches: Array[String] =
    Merges.map { case (a, b) => s"$Sep$a$Sep$Sep$b$Sep" }.toArray
  private val repls: Array[String] =
    Merges.map { case (a, b) => s"$Sep$a$b$Sep" }.toArray

  private val Pretok: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(Pattern)

  /** Merged-token count of one pre-tokenizer segment. */
  private def segTokens(seg0: String): Long = {
    val seg = seg0.replace(SepStr, "")
    if (seg.isEmpty) return 0L
    val sb = new java.lang.StringBuilder(seg.length * 3)
    var i = 0
    while (i < seg.length) {
      val cp = seg.codePointAt(i)
      sb.append(Sep)
      sb.appendCodePoint(cp)
      sb.append(Sep)
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var k = 0
    while (k < searches.length) {
      s = s.replace(searches(k), repls(k))
      k += 1
    }
    var cnt = 0L
    var j = 0
    while (j < s.length) {
      if (s.charAt(j) == Sep) cnt += 1
      j += 1
    }
    cnt / 2
  }

  /** Called once per row from generated code. */
  def countTokens(text: String): Long = {
    var total = 0L
    val m = Pretok.matcher(text)
    while (m.find()) total += segTokens(m.group())
    total
  }

  def bpeMergeTokens(c: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      BpeMergeTokens(org.apache.spark.sql.graftshim.GraftShims.expression(c)))

  // ------------------------------------------------------- DuckDB twin SQL

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB expression computing [[segTokens]] for a lambda-bound segment
    * variable `seg`: codepoints via `regexp_extract_all(seg2, '(?s).')`
    * (RE2 '.', one rune — matches the Scala side's codePointAt walk), each
    * wrapped `␟cp␟` (join with `chr(31)` doubled between, single at the
    * ends), swept by the same boundary-anchored replace chain, separators
    * counted by length difference, halved. DuckDB `replace` is the same
    * left-to-right non-overlapping scan as Java `String.replace`. */
  def segTokensSql(segVar: String): String = {
    val S = "chr(31)"
    val seg2 = s"replace($segVar, $S, '')"
    val joined =
      s"$S || array_to_string(regexp_extract_all($seg2, '(?s).'), $S || $S) || $S"
    val swept = Merges.foldLeft(joined) { case (acc, (a, b)) =>
      s"replace($acc, $S || ${sqlLit(a)} || $S || $S || ${sqlLit(b)} || $S, " +
        s"$S || ${sqlLit(a + b)} || $S)"
    }
    // empty segment (a pure-U+001F run): joined would read '␟␟' = 1 token
    s"CASE WHEN $seg2 = '' THEN 0 ELSE " +
      s"(length($swept) - length(replace($swept, $S, ''))) // 2 END"
  }
}
