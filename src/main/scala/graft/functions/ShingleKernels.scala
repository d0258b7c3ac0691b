package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native kernels for the word-shingle hot path.
  *
  * The declarative forms — `array_distinct(transform(sequence(...),
  * i => array_join(slice(toks, i, n), " ")))` and the hashed variant with
  * an md5 chain inside the lambda — are built from HIGHER-ORDER functions,
  * which Spark does not whole-stage-codegen: every window pays an
  * interpreted lambda dispatch plus slice/join allocations, and
  * `array_distinct` adds a second interpreted pass. Measured at sf0.1
  * (r20, guide §1): the shingle projection alone cost ~2.5 s per corpus
  * pass — more than the self-join it feeds.
  *
  * These kernels compute the identical values in one pass over the raw
  * UTF-8 bytes. The crucial identity: `split(text, " ")` splits on a
  * SINGLE space (keeping empty tokens, trailing included — limit −1) and
  * the window re-joins with the same single space, so every shingle IS a
  * byte-slice of the original text between two token boundaries — no
  * slice/join materialization is needed, and a window's hash can be
  * computed directly over the byte range. A space byte (0x20) can never
  * occur inside a multi-byte UTF-8 sequence, so byte scanning is exact.
  *
  * Equality obligations (vs the declarative forms, bit-for-bit):
  *   - token count T = #spaces + 1; windows exist iff T ≥ n; window i
  *     (0-based, i ≤ T−n) spans [start(i), end(i+n−1)) — identical to
  *     slice(toks, i+1, n) + array_join ' '.
  *   - distinct keeps FIRST-OCCURRENCE order (array_distinct's rule).
  *   - hash60 = first 15 hex chars of md5 parsed base-16 = the digest's
  *     first 7 bytes and the high nibble of byte 7 (60 bits, positive).
  *   - fast mode = xxhash64(shingle) & (2^60−1): XXH64 over the same
  *     bytes with Spark's seed 42.
  *
  * Each expression participates in whole-stage codegen through a single
  * per-row virtual call on the referenced kernel object (the MinHashAll
  * pattern) — the per-window loop runs as plain JVM code.
  */
private[graft] object ShingleKernels {

  /** Byte offsets of each token start, and a parallel array of ends:
    * boundaries at single-space bytes. Returns (starts, ends, count). */
  private def tokenBounds(b: Array[Byte]): (Array[Int], Array[Int], Int) = {
    var spaces = 0
    var i = 0
    while (i < b.length) { if (b(i) == ' ') spaces += 1; i += 1 }
    val t = spaces + 1
    val starts = new Array[Int](t)
    val ends = new Array[Int](t)
    starts(0) = 0
    var k = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { ends(k) = i; k += 1; starts(k) = i + 1 }
      i += 1
    }
    ends(k) = b.length
    (starts, ends, t)
  }

  /** Distinct window slices as UTF8Strings, first-occurrence order. */
  def distinctShingles(text: UTF8String, n: Int): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = tokenBounds(b)
    val wins = t - n + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](wins * 2)
    var i = 0
    while (i < wins) {
      val s = starts(i)
      val e = ends(i + n - 1)
      seen.add(UTF8String.fromBytes(b, s, e - s))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hash60 of a byte range: first 15 hex chars of md5, base-16. */
  private def md5Hash60(b: Array[Byte], s: Int, e: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(b, s, e - s)
    val h = d.digest()
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  private val Mask60 = (1L << 60) - 1

  /** Distinct hashed window values, first-occurrence order. `fast` uses
    * xxhash64 (seed 42, Spark's builtin) masked to 60 bits; default is
    * the cross-engine md5 hash60. */
  def distinctHashedShingles(text: UTF8String, n: Int, fast: Boolean): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = tokenBounds(b)
    val wins = t - n + 1
    if (wins <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long](wins * 2)
    var i = 0
    while (i < wins) {
      val s = starts(i)
      val e = ends(i + n - 1)
      val v =
        if (fast)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, e - s, 42L) & Mask60
        else md5Hash60(b, s, e)
      seen.add(v)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Non-empty tokens of a single-space split — the twin of
    * `filter(split(text, " "), t => t <> "")`, one byte pass. */
  def tokensNonEmpty(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = tokenBounds(b)
    var cnt = 0
    var i = 0
    while (i < t) { if (ends(i) > starts(i)) cnt += 1; i += 1 }
    val out = new Array[AnyRef](cnt)
    var j = 0
    i = 0
    while (i < t) {
      if (ends(i) > starts(i)) {
        out(j) = UTF8String.fromBytes(b, starts(i), ends(i) - starts(i))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed NON-EMPTY tokens, multiplicity and order kept — the twin of
    * `transform(tokens(text), t => contentHash(t))` (the SimHash input). */
  def hashedTokens(text: UTF8String, fast: Boolean): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = tokenBounds(b)
    var cnt = 0
    var i = 0
    while (i < t) { if (ends(i) > starts(i)) cnt += 1; i += 1 }
    val out = new Array[Long](cnt)
    var j = 0
    i = 0
    while (i < t) {
      if (ends(i) > starts(i)) {
        out(j) =
          if (fast)
            org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + starts(i),
              ends(i) - starts(i), 42L) & Mask60
          else md5Hash60(b, starts(i), ends(i))
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Count of array elements ∈ `vocab` (duplicates kept) — the twin of
    * `size(filter(toks, t => t.isInCollection(vocab)))`. */
  def countTokensIn(arr: ArrayData, vocab: java.util.HashSet[UTF8String]): Int = {
    val t = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < t) { if (vocab.contains(arr.getUTF8String(i))) cnt += 1; i += 1 }
    cnt
  }

  /** All window joins over a TOKEN ARRAY (no distinct, positions kept) —
    * the twin of TextFunctions.shinglesOfTokens over an already-built
    * token array (bigram builders, positional coverage windows). */
  def shinglesOfTokenArray(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    val wins = t - n + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](wins)
    val space = UTF8String.fromString(" ")
    i = 0
    while (i < wins) {
      out(i) =
        if (n == 2) UTF8String.concat(toks(i), space, toks(i + 1))
        else {
          val parts = new Array[UTF8String](2 * n - 1)
          var k = 0
          while (k < n) {
            parts(2 * k) = toks(i + k)
            if (k < n - 1) parts(2 * k + 1) = space
            k += 1
          }
          UTF8String.concat(parts: _*)
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array_distinct(wordShingles(text, n))` as one codegen-participating
  * per-row kernel call. */
case class WordShinglesDistinct(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_distinct"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.distinctShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.distinctShingles($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShinglesDistinct =
    copy(child = newChild)
}

/** `array_distinct(transform(wordShingles(text, n), s => hash(s)))` as one
  * codegen-participating per-row kernel call (hash = hash60 or the
  * 60-bit-masked xxhash64 fast path). */
case class HashedShinglesDistinct(child: Expression, n: Int, fast: Boolean)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles_distinct"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.distinctHashedShingles(input.asInstanceOf[UTF8String], n, fast)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.distinctHashedShingles($c, $n, $fast);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesDistinct =
    copy(child = newChild)
}

/** `transform(tokens(text), t => contentHash(t))` as one
  * codegen-participating per-row kernel call (multiplicity kept). */
case class HashedTokens(child: Expression, fast: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_tokens"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.hashedTokens(input.asInstanceOf[UTF8String], fast)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.hashedTokens($c, $fast);")

  override protected def withNewChildInternal(newChild: Expression): HashedTokens =
    copy(child = newChild)
}

/** `filter(split(text, " "), t => t <> "")` as one codegen-participating
  * per-row kernel call. */
case class TokensNonEmpty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens_non_empty"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.tokensNonEmpty(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.tokensNonEmpty($c);")

  override protected def withNewChildInternal(newChild: Expression): TokensNonEmpty =
    copy(child = newChild)
}

/** `size(filter(arr, t => t.isInCollection(vocab)))` as one
  * codegen-participating per-row kernel call (duplicates kept). */
case class CountTokensIn(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "count_tokens_in"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.countTokensIn(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("ctiVocab", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.countTokensIn($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountTokensIn =
    copy(child = newChild)
}

/** `shinglesOfTokens(arr, n)` (no distinct, positions kept) as one
  * codegen-participating per-row kernel call over a token-array column. */
case class ShinglesOfTokenArray(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_of_token_array"

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.shinglesOfTokenArray(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernels.shinglesOfTokenArray($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesOfTokenArray =
    copy(child = newChild)
}

object ShingleExprs {
  import org.apache.spark.sql.graftshim.GraftShims.{column, expression}

  def wordShinglesDistinct(text: Column, n: Int): Column =
    column(WordShinglesDistinct(expression(text), n))

  def hashedShinglesDistinct(text: Column, n: Int, fast: Boolean): Column =
    column(HashedShinglesDistinct(expression(text), n, fast))

  def shinglesOfTokenArray(arr: Column, n: Int): Column =
    column(ShinglesOfTokenArray(expression(arr), n))

  def tokensNonEmpty(text: Column): Column =
    column(TokensNonEmpty(expression(text)))

  def hashedTokens(text: Column, fast: Boolean): Column =
    column(HashedTokens(expression(text), fast))

  def countTokensIn(arr: Column, vocab: Seq[String]): Column =
    column(CountTokensIn(expression(arr), vocab))
}
