package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document winnowing fingerprints (Schleimer et al. 2003) as ONE
  * codegen'd kernel: per input string, hash every k-char gram, select
  * positions whose hash equals the minimum over the w-gram window ending
  * there, and emit the distinct selected hashes sorted ascending.
  *
  * This replaces t08's relational formulation — explode to ~(len−k+1)
  * rows per doc, windowed `min` over rows(−(w−1), 0), self-filter,
  * distinct — whose per-position cost was 5 substring allocations + 5
  * interpreted-chain ops and whose plan needed a per-doc sort for the
  * window plus an aggregation exchange for the distinct. The kernel does
  * the identical selection in one pass over a per-doc code array: zero
  * allocation per position, no window sort, no distinct shuffle (the
  * emitted array is already per-doc distinct). At 100 TB this turns the
  * stage from "shuffle ~30× the corpus row count" into a map-only
  * scan.
  *
  * Hash parity with the DuckDB oracle is byte-exact: per gram a base-32
  * polynomial over `codepoint % 32` (injective on the post-clean
  * `[a-z ]` alphabet), scrambled by the Knuth multiplicative step
  * `(p · 2654435761) mod 2³²` — p < 2²⁵ keeps the product < 2⁵⁷,
  * overflow-free in both engines. The ASCII fast path reads UTF8String
  * bytes directly; non-ASCII input (impossible post-clean, legal for
  * the expression) falls back to code-point iteration, matching
  * `ascii(substring(c, pos, 1))` semantics exactly.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1 (got k=$k, w=$w)")
  // base-32 polynomial accumulates without reduction: p < 32^k must fit a
  // Long (k <= 12 ⇒ p < 2^60); past that p itself wraps and the gram hash
  // silently diverges from the documented mod-2^32 definition
  require(k <= 12, s"winnow gram hash overflows past k = 12 (got k=$k)")
  // analysis-time input check: a non-string child fails with a named error
  // instead of a runtime ClassCastException / generated-code compile error
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(s: Any): Any =
    WinnowFingerprints.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel is a static call — all per-position work happens inside
    // one JIT-friendly method, and the expression stays inside
    // whole-stage codegen (no virtual eval dispatch per row)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WinnowFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowFingerprints {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Distinct winnowing fingerprints of `c` as ARRAY<BIGINT> (codegen'd). */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(c), k, w))

  /** One-pass winnow over a single document. Called from generated code. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    // code-point array: ASCII fast path reads bytes (numBytes == numChars
    // ⟺ pure ASCII for valid UTF-8); otherwise decode code points
    val codes: Array[Int] =
      if (s.numBytes == s.numChars) {
        val b = s.getBytes
        val out = new Array[Int](b.length)
        var i = 0
        while (i < b.length) { out(i) = b(i) & 0xff; i += 1 }
        out
      } else {
        val str = s.toString
        val out = new Array[Int](str.codePointCount(0, str.length))
        var i = 0
        var j = 0
        while (i < str.length) {
          val cp = str.codePointAt(i)
          out(j) = cp
          j += 1
          i += Character.charCount(cp)
        }
        out
      }
    val m = codes.length - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      var p = 0L
      var j = 0
      while (j < k) { p = p * 32L + (codes(i + j) % 32); j += 1 }
      // floorMod: for k <= 5 the product fits 2^57 and this equals plain %,
      // byte-identical to the DuckDB oracle; for k in 6..12 the product may
      // wrap the Long, where floorMod still yields the true low 32 bits
      // (mod-2^64 wrap preserves them) instead of %'s negative remainder
      h(i) = Math.floorMod(p * 2654435761L, 4294967296L)
      i += 1
    }
    // winnow selection: keep h(i) iff it equals the min over the window
    // of w grams ENDING at i (rows between -(w-1) and current)
    val sel = new Array[Long](m)
    var ns = 0
    i = 0
    while (i < m) {
      var mn = h(i)
      var j = if (i - w + 1 > 0) i - w + 1 else 0
      while (j < i) { if (h(j) < mn) mn = h(j); j += 1 }
      if (h(i) == mn) { sel(ns) = h(i); ns += 1 }
      i += 1
    }
    // sort + dedupe in place: the emitted set is per-doc distinct and
    // deterministically ordered
    java.util.Arrays.sort(sel, 0, ns)
    var u = 0
    i = 0
    while (i < ns) {
      if (u == 0 || sel(i) != sel(u - 1)) { sel(u) = sel(i); u += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOfRange(sel, 0, u))
  }
}
