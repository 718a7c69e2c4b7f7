package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-aware broadcast guard for vocabulary-shaped relations (r10
  * verdict "What's missing" #2).
  *
  * The n-gram LM family joins the corpus-scale token stream against a
  * VOCABULARY-sized model table (t13 term probabilities, t15 prefix
  * counts, p10 the merged DSIR model). Vocabulary size is Heaps'-law
  * sublinear in corpus size but NOT constant: at the reference's scale
  * it is 2,000 terms (ref 02_build_models.R:180), at sf0.1 it is tens
  * of thousands, and a web-scale corpus carries 10⁸–10⁹ token types —
  * where an unconditional `broadcast()` hint is an executor OOM, not a
  * plan choice. This helper makes the plan decision follow the DATA:
  * broadcast below a configurable row ceiling, plain (shuffle-joinable)
  * relation above it.
  *
  * Cost discipline: the relation is localCheckpoint'ed FIRST, so the
  * bounded row probe and the downstream join share one materialization
  * — the guard adds a count job over already-computed partitions, not a
  * second run of the aggregation that built the table. (A `limit(n)`
  * probe would not help here: these tables sit above hash aggregations,
  * which must consume all input before emitting their first row.)
  * Above the ceiling the checkpointed relation feeds the shuffle join
  * directly — the materialization is block-manager-resident and
  * disk-spillable, vocabulary-sized by definition.
  */
object SizeGuard {

  /** Session conf key for the broadcast row ceiling (tests use it to
    * force the shuffle fallback at tiny scale). */
  val MaxRowsKey = "graft.broadcast.maxRows"

  /** Default ceiling: 10M rows ≈ 500 MB of (term, count) pairs per
    * executor — comfortably broadcastable on the 100 TB reference
    * hardware, an order of magnitude under a web-scale type inventory. */
  val DefaultMaxRows: Long = 10L * 1000 * 1000

  /** `rel`, materialized once per (session, `memoKey`), with a
    * broadcast hint iff its row count is at or under the session's
    * configured ceiling.
    *
    * The materialization (checkpoint + its count) is memoized through
    * [[graft.api.Intermediates]] (r11 ADVICE): repeat constructions of
    * the same query — bench re-runs, a long-lived session — reuse ONE
    * checkpoint instead of parking a new vocabulary-sized RDD in the
    * block manager per call; the harness's family-boundary release
    * reclaims it like every other pinned intermediate. The key names
    * the (operator, dataset) pair because it fully describes the
    * relation's content. The broadcast-or-shuffle DECISION is re-taken
    * per call against the current conf ceiling (the fallback spec
    * flips the ceiling at runtime), only the materialization is
    * shared. */
  def broadcastIfSmall(rel: DataFrame, memoKey: String): DataFrame =
    broadcastIfSmall(rel, Some(memoKey))

  /** As above; `None` skips the memo — for frame-parametric callers
    * whose relation varies per invocation (micro-batch shapes, specs),
    * where memoizing would serve STALE data. Those callers own the
    * per-call checkpoint's lifecycle (released by the harness's
    * non-pinned scratch sweep, or at session end). */
  def broadcastIfSmall(rel: DataFrame, memoKey: Option[String]): DataFrame = {
    val maxRows = rel.sparkSession.conf
      .get(MaxRowsKey, DefaultMaxRows.toString).toLong
    def build = { val m = rel.localCheckpoint(); (m, m.count()) }
    val (mat, n) = memoKey match {
      case Some(k) =>
        graft.api.Intermediates.memo(rel.sparkSession, s"sizeguard|$k")(build)
      case None => build
    }
    if (n <= maxRows) broadcast(mat) else mat
  }
}
