package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined n-gram assembly shared by every kernel whose output must
  * stay byte-identical to `concat_ws(" ", slice(toks, i, n))` — one copy so
  * the winnow kernel's hashes can never drift from word_ngrams' strings. */
private[functions] object Grams {
  private val space = UTF8String.fromString(" ")

  def gram(toks: ArrayData, start: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n) {
      parts(2 * j) = toks.getUTF8String(start + j)
      if (j < n - 1) parts(2 * j + 1) = space
      j += 1
    }
    UTF8String.concat(parts: _*)
  }
}

/** Word n-gram construction in one compiled loop per row.
  *
  * The declarative formulation — `transform(sequence(1, m-n+1),
  * i -> concat_ws(" ", slice(toks, i, n)))` — dispatches an interpreted
  * lambda per position and allocates a slice array per n-gram; on a corpus
  * pass that is the single hottest text kernel (every dedup/fingerprint
  * operator starts here). This expression builds the same strings
  * (space-joined, `array_distinct` first-occurrence order when distinct)
  * in one JVM loop. CodegenFallback: the win is removing per-element
  * interpretation, not fusing into surrounding codegen.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_ngrams expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val count = m - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(Grams.gram(toks, i, n))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) { out(i) = Grams.gram(toks, i, n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints (the MOSS scheme) in one compiled pass per row:
  * positional word n-grams → md5-derived 32-bit hashes → sliding-window
  * minima of width `w` → first-occurrence distinct.
  *
  * The declarative chain — `word_ngrams_pos` + `transform(sh, md5...)` +
  * `transform(sequence(...), j -> array_min(slice(hv, j, w)))` — allocates a
  * slice array and dispatches an interpreted lambda per window on the
  * hottest fingerprint path. This expression produces the identical hash
  * values (md5 of the gram's UTF-8 bytes, first 8 hex digits as a base-16
  * integer = the digest's first 4 bytes big-endian unsigned — matching
  * `conv(substring(md5(x), 1, 8), 16, 10)`), the identical window minima,
  * and `array_distinct`'s first-occurrence order, so the DuckDB oracle and
  * all downstream pair joins are unchanged. CodegenFallback: the win is
  * removing per-window interpretation, not fusing into surrounding codegen.
  */
case class WinnowFingerprint(child: Expression, n: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"winnow_fp expects array<string>, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val cnt = m - n + 1 // positional n-gram count
    if (cnt < w) return new GenericArrayData(Array.empty[Any])
    val md = WinnowFingerprint.digest.get()
    val hv = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      md.reset()
      val d = md.digest(Grams.gram(toks, i, n).getBytes)
      hv(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    val windows = cnt - w + 1
    while (s < windows) {
      var mn = hv(s)
      var k = 1
      while (k < w) { if (hv(s + k) < mn) mn = hv(s + k); k += 1 }
      seen.add(mn)
      s += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** MD5 instances are not thread-safe and not free to construct — one per
    * executor thread. */
  private[functions] val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
}

/** Positional n-token window hashes in one compiled pass per row: for m
  * tokens, an array of m−n+1 60-bit hashes, hash i covering the n-gram at
  * 1-based position i+1. The hash is the md5 digest's first 15 hex digits
  * as a base-16 integer (= first 7 bytes big-endian plus the 8th byte's
  * high nibble — matching `conv(substring(md5(x), 1, 15), 16, 10)`), wide
  * enough that at 10¹² corpus windows the expected collision count stays
  * negligible next to the verify stage that removes them. This is the
  * corpus-pass kernel of the substring-span dedup operator (Lee et al.
  * 2021's exact-substring family, hash-blocked); the winnow kernel above
  * differs in window-minima selection, this one keeps EVERY position so
  * span boundaries can be reconstructed. */
case class SpanHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"span_hashes expects array<string>, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val md = WinnowFingerprint.digest.get()
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      md.reset()
      val d = md.digest(Grams.gram(toks, i, n).getBytes)
      out(i) = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >> 4)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 16-bit SimHash over distinct tokens in one compiled pass.
  *
  * The declarative formulation — 16 per-bit `aggregate(hv, ...)` higher-order
  * functions over an md5-transform column — is correct but its expression
  * tree alone (16 lambda aggregates) dominates analysis + codegen time for
  * every plan that embeds it, and each aggregate re-traverses hv
  * interpreted. This kernel: distinct tokens (first-occurrence set), token
  * hash = first 2 md5 bytes big-endian (= `conv(substring(md5(t),1,4),16,10)`),
  * per-bit counter Σ(2·bit−1), bit set when the counter ≥ 0 — integer sums,
  * so ordering is immaterial and the result equals the HOF formulation and
  * the DuckDB oracle exactly. */
case class Simhash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash16 expects array<string>, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash16"

  // a NULL token array hashes to 0, never NULL: the declarative 16-lambda
  // formulation and the DuckDB oracle both send null through their
  // CASE/ELSE-0 arm (list_sum(NULL) >= 0 is not true), so the kernel must
  // not take UnaryExpression's default null-intercepting path
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val counters = new Array[Int](16)
    val md = WinnowFingerprint.digest.get()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes)
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        var b = 0
        while (b < 16) {
          counters(b) += ((h >> b) & 1) * 2 - 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (counters(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk boundaries in one compiled O(len) rolling pass —
  * the kernel behind [[graft.operators.Dedup.cdcChunks]].
  *
  * Semantics are pinned to the HOF/SQL specification the DuckDB twin runs:
  * for each 1-based code-point position i ≥ `window`,
  * H(i) = (Σ_{j=0..w−1} codepoint(i−j) · 31^j) mod (2³¹−1); i is a
  * boundary when H % `divisor` == 0; the final position is always a
  * boundary (appended only if the hash did not already place one there; a
  * 0-length text yields [0]). The interpreted HOF formulation costs
  * O(len·w) lambda dispatches + substring allocations per row (measured
  * 15 s at sf0.1); this kernel keeps the UNREDUCED window sum rolling —
  * H(e+1) = cp(e+1) + 31·(H(e) − cp(e−w+1)·31^{w−1}), exact in a long
  * since Σ < 2^56 — and applies the mod per emission, so every value is
  * bit-identical to the spec at O(len) total. CodegenFallback like the
  * winnow kernel: one interpreted dispatch per ROW is noise; the loop
  * inside is compiled. */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cdc_bounds expects string, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = s"cdc_bounds_${window}_$divisor"

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val p = 2147483647L
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (n >= window) {
      // 31^(w-1) for the outgoing term
      var powTop = 1L
      var j = 1
      while (j < window) { powTop *= 31L; j += 1 }
      // initial unreduced sum at e = window-1 (0-based last index):
      // Σ_{j=0..w-1} cp(e-j)·31^j, Horner over ascending char index
      var h = 0L
      j = 0
      while (j < window) { h = h * 31L + cps(j); j += 1 }
      var e = window - 1
      while (e < n) {
        if ((h % p) % divisor == 0) out += (e + 1).toLong
        e += 1
        if (e < n) h = cps(e) + 31L * (h - cps(e - window) * powTop)
      }
    }
    if (out.isEmpty || out.last != n.toLong) out += n.toLong
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Register the compiled 16-bit SimHash kernel. */
  def registerSimhash(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[Simhash16].getName, "simhash16"),
      (children: Seq[Expression]) => Simhash16(children.head))
  }

  /** Register the compiled winnowing kernel for a given (n, w). */
  def registerWinnow(spark: SparkSession, n: Int, w: Int): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"winnow_fp_${n}_$w"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, s"winnow_fp_${n}_$w"),
      (children: Seq[Expression]) => WinnowFingerprint(children.head, n, w))
  }

  /** Register the compiled CDC boundary kernel for a given (window, divisor). */
  def registerCdc(spark: SparkSession, window: Int, divisor: Int): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"cdc_bounds_${window}_$divisor"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, s"cdc_bounds_${window}_$divisor"),
      (children: Seq[Expression]) => CdcBoundaries(children.head, window, divisor))
  }

  /** Register the compiled positional span-hash kernel for a given n. */
  def registerSpanHashes(spark: SparkSession, n: Int): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"span_hashes_$n"),
      new ExpressionInfo(classOf[SpanHashes].getName, s"span_hashes_$n"),
      (children: Seq[Expression]) => SpanHashes(children.head, n))
  }

  /** Register `word_ngrams_distinct` / `word_ngrams_pos` for a given n. */
  def register(spark: SparkSession, n: Int): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"word_ngrams_distinct_$n"),
      new ExpressionInfo(classOf[WordNgrams].getName, s"word_ngrams_distinct_$n"),
      (children: Seq[Expression]) => WordNgrams(children.head, n, distinct = true))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(s"word_ngrams_pos_$n"),
      new ExpressionInfo(classOf[WordNgrams].getName, s"word_ngrams_pos_$n"),
      (children: Seq[Expression]) => WordNgrams(children.head, n, distinct = false))
  }
}
