package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The `fns`-function MinHash signature of a shingle array as ONE
  * codegen'd kernel: per row, `sig[i] = min over shingles of
  * xxhash64(i, shingle)` — bit-identical to Spark's own
  * `min(xxhash64(lit(i), col))` aggregation (the hash is computed by
  * SAME `XXH64` static kernels codegen emits: `hashInt(i, seed=42)`
  * for the int literal, then `hashUTF8String` over the shingle), so
  * the kernel can
  * replace either formulation without moving a single bucket.
  *
  * Why it exists (r14): the batch signature build was explode +
  * `fns` min-aggregates — one corpus-scale SHUFFLE of (doc_id,
  * shingle) rows per index build — and the streaming-safe row-local
  * variant was `fns` interpreted `array_min(transform(...))` passes
  * (higher-order functions don't participate in whole-stage codegen;
  * the repo's own t08 lesson measured the interpreted-HOF tax at
  * ~50x). The kernel does the identical math in one JIT-compiled
  * pass over the shingle array: no shuffle in the batch build, no
  * interpreted lambdas on the stream, one expression for BOTH paths
  * so they provably cannot drift. At 100 TB this turns the index
  * build's widest stage from "shuffle ~shingle-count rows" into a
  * map-only scan.
  *
  * Null semantics match the replaced forms: a null shingle ELEMENT
  * hashes to its seed prefix (exactly `xxhash64(lit(i), null)`), and
  * an empty array yields the null signature (the relational explode
  * form emits no row for it — callers filter empty shingle sets
  * first, as both band builders do).
  */
case class MinHashSignature(child: Expression, fns: Int)
    extends UnaryExpression {
  require(fns >= 1, s"minhash needs fns >= 1 (got $fns)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> child, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(a: Any): Any =
    MinHashSignature.compute(a.asInstanceOf[ArrayData], fns)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.MinHashSignature.compute($c, $fns);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `fns`-function MinHash signature of an ARRAY<STRING> column as
    * ARRAY<BIGINT> (codegen'd); null on an empty/null shingle set. */
  def minhashSignature(c: Column, fns: Int): Column =
    column(MinHashSignature(expression(c), fns))

  /** Per-seed prefix `xxhash64(i, ·)` states, cached per fn count —
    * the int-literal half of the hash is row-invariant. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def prefixes(fns: Int): Array[Long] =
    prefixCache.computeIfAbsent(fns, n => {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = XXH64.hashInt(i, 42L); i += 1 }
      out
    })

  /** One-pass signature over a shingle array. Called from generated
    * code. Returns null for an empty array (no shingles — the
    * relational form's "no rows" case). */
  def compute(arr: ArrayData, fns: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val pre = prefixes(fns)
    val sig = new Array[Long](fns)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var e = 0
    while (e < n) {
      if (arr.isNullAt(e)) {
        // xxhash64(lit(i), null) contributes the bare prefix
        var i = 0
        while (i < fns) {
          if (pre(i) < sig(i)) sig(i) = pre(i)
          i += 1
        }
      } else {
        val u = arr.getUTF8String(e)
        var i = 0
        while (i < fns) {
          val h = XXH64.hashUTF8String(u, pre(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      e += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}
