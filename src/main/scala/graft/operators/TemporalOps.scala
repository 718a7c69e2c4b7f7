package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join / analytics operators the built-in surface lacks as
  * single relations: backward as-of join, radius range join, and
  * retention cohorts. All three are composed from existing Catalyst
  * operators (union + window, generator + equi-join, two hash
  * aggregations) — no custom physical plan is needed, and each avoids
  * the naive shape that dies at scale (an inequality theta-join plans
  * BroadcastNestedLoop/cartesian: O(|L|·|R|) comparisons and a
  * single-task build at 100 TB).
  *
  * Reference surface: the reference pipeline has no temporal join (its
  * event analysis is per-entity window passes, ref
  * 01_extract_features.R:79-143); these complete the engine's
  * event-analytics family (q15/q17/q20/q24/q26/q30/q31) with the three
  * standard shapes it structurally cannot express.
  */
object TemporalOps {

  /** The generic operators below stage their plumbing in internal
    * columns. Rather than reserving names (and erroring on user frames
    * that happen to carry them), each internal name is generated FRESH
    * against the union of both inputs' columns — a numeric suffix is
    * appended until it clashes with nothing, so any input schema works.
    * Only documented OUTPUT columns (e.g. asofJoin's `asof`) still
    * require a free name, with a loud driver-side error. */
  private def freshName(base: String, taken: Set[String]): String = {
    var cand = base
    var i = 0
    while (taken.contains(cand)) { cand = s"$base$i"; i += 1 }
    cand
  }

  private def requireFreeNames(df: DataFrame, side: String,
                               reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$side relation carries reserved output column name(s) " +
        s"${clash.mkString(", ")} — rename before calling")
  }

  /** Generic as-of join, implemented WITHOUT a join: tag both
    * relations, union them, and take `last(right_row, ignoreNulls)` over
    * a (key, time, side, id)-ordered running window — one shuffle on the
    * key, state bounded by the window frame, no range-candidate fanout.
    * This is the scalable alternative to the naive inequality join
    * (whose per-left-row candidate set grows with the right relation's
    * history) and distributes on the as-of key exactly like any keyed
    * aggregation.
    *
    * Contract: both frames expose `key`, `timeUs` (epoch MICROS, long —
    * subtraction must be exact integer arithmetic) and `idCol` (the
    * deterministic tie-break within equal timestamps). Matching is
    * time-INCLUSIVE (a right row at exactly the left row's timestamp
    * matches — right rows sort before left rows at equal times in the
    * traversal direction). `forward = false` (default) matches the most
    * recent right row at-or-before the left time, largest `idCol`
    * winning among equal-time right rows; `forward = true` is the exact
    * mirror — the EARLIEST right row at-or-after the left time within
    * tolerance, smallest `idCol` winning — via the same single window
    * pass with the traversal order reversed (time and id descending;
    * the side bit is direction-invariant: right rows must precede left
    * rows at equal times either way). A match outside `toleranceUs` is
    * nulled, not dropped — the output keeps exactly the left relation's
    * rows (left-outer semantics).
    *
    * Returns the left frame's columns plus `asof`: a struct of the
    * matched right row, or null when no right row qualifies.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      timeUs: String, idCol: String, toleranceUs: Long,
      forward: Boolean = false): DataFrame = {
    // `asof` is the documented output column — a left frame already
    // carrying it would make the result ambiguous, so that one stays a
    // loud error; every internal staging name is generated fresh below.
    requireFreeNames(left, "asofJoin left", Seq("asof"))
    val taken = left.columns.toSet ++ right.columns.toSet + "asof"
    val Seq(cL, cR, cK, cT, cId, cSide, cM) =
      Seq("__l", "__r", "__k", "__t", "__id", "__side", "__m")
        .map(freshName(_, taken))
    val rStructT = right.select(struct(right.columns.toIndexedSeq.map(col): _*).as(cR))
      .schema(cR).dataType
    val lStructT = left.select(struct(left.columns.toIndexedSeq.map(col): _*).as(cL))
      .schema(cL).dataType
    val lPart = left.select(
      struct(left.columns.toIndexedSeq.map(col): _*).as(cL),
      col(key).as(cK), col(timeUs).as(cT), col(idCol).as(cId),
      lit(1).as(cSide), lit(null).cast(rStructT).as(cR))
    val rPart = right.select(
      lit(null).cast(lStructT).as(cL),
      col(key).as(cK), col(timeUs).as(cT), col(idCol).as(cId),
      lit(0).as(cSide), struct(right.columns.toIndexedSeq.map(col): _*).as(cR))
    // right rows (side 0) sort before left rows (side 1) at equal time —
    // that single bit IS the inclusive-match semantics; reversing time
    // and id (but not the side bit) turns backward into forward
    val ord =
      if (forward) Seq(col(cT).desc, col(cSide), col(cId).desc)
      else Seq(col(cT), col(cSide), col(cId))
    val w = Window.partitionBy(col(cK))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val gap =
      if (forward) col(cM).getField(timeUs) - col(cT)
      else col(cT) - col(cM).getField(timeUs)
    lPart.unionByName(rPart)
      .withColumn(cM, last(col(cR), ignoreNulls = true).over(w))
      .filter(col(cSide) === 1)
      .withColumn("asof", when(col(cM).isNotNull && gap <= toleranceUs,
        col(cM)))
      .select(col(s"$cL.*") +: Seq(col("asof")): _*)
  }

  /** Generic radius range join via bin bucketing: events carry ONE bin
    * (width = 2·radius), probes explode to the 2-3 bins their
    * ±radius window can overlap, and the match is an ordinary
    * shuffled EQUI-join on the bin followed by the exact |Δt| ≤ radius
    * refinement. Each true (probe, event) pair appears exactly once —
    * the event side has a single bin — so no post-join dedup is needed.
    * Bounded fanout (≤ ⌈2r/w⌉+1 = 3 rows per probe), uniform shuffle
    * keys, AQE-skew-absorbable: the 100 TB shape for a time-radius
    * join, vs. the BroadcastNestedLoopJoin Catalyst plans for the raw
    * inequality predicate.
    */
  def rangeJoinPairs(probes: DataFrame, events: DataFrame,
      probeTimeUs: String, eventTimeUs: String, radiusUs: Long): DataFrame = {
    val bin = freshName("__bin",
      probes.columns.toSet ++ events.columns.toSet)
    val w = 2 * radiusUs
    val binned = events.withColumn(bin, expr(s"$eventTimeUs div ${w}L"))
    probes
      .withColumn(bin, explode(sequence(
        expr(s"($probeTimeUs - ${radiusUs}L) div ${w}L"),
        expr(s"($probeTimeUs + ${radiusUs}L) div ${w}L"))))
      .join(binned, bin)
      .filter(abs(col(eventTimeUs) - col(probeTimeUs)) <= radiusUs)
      .drop(bin)
  }

  /** q35 — backward as-of join with tolerance over two relations (most
    * recent qualifying `view` per `purchase`, same user, ≤ 2 h lookback)
    * through [[asofJoin]]'s union+window path. Distinct from q24's
    * single-relation attribution window: this is the general two-table
    * operator (market data joins, sensor alignment, price-at-order).
    * Plan-pinned JOIN-FREE — one hash exchange on the key, no
    * BroadcastNestedLoop candidate explosion (PlanAuditSpec). */
  def asofViews(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"),
        round(col("value"), 2).as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us"))
    asofJoin(purchases, views, "user_id", "us", "event_id",
        toleranceUs = 2L * 3600 * 1000000)
      .select(col("event_id"), col("user_id"), col("purchase_value"),
        col("asof.event_id").as("view_id"),
        when(col("asof").isNotNull,
          expr("(us - asof.us) div 1000000")).as("gap_s"))
      .orderBy(col("event_id"))
  }

  /** The oracle is the NAIVE shape (inequality join + row_number) the
    * scalable path must reproduce: DuckDB's optimizer handles the small
    * SF fine, while the Spark side proves the join-free plan. Tie-break
    * parity: rn orders (us DESC, event_id DESC) ≙ the window's
    * last-over-(us ASC, id ASC). */
  private[graft] val asofViewsSql =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    round(value, 2) AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events WHERE event_type = 'view'),
      |cand AS (
      |  SELECT p.event_id, v.event_id AS view_id,
      |    (p.us - v.us) // 1000000 AS gap_s,
      |    row_number() OVER (PARTITION BY p.event_id
      |      ORDER BY v.us DESC, v.event_id DESC) AS rn
      |  FROM p JOIN v ON v.user_id = p.user_id AND v.us <= p.us
      |    AND p.us - v.us <= 7200000000)
      |SELECT p.event_id, p.user_id, p.purchase_value, c.view_id, c.gap_s
      |FROM p LEFT JOIN cand c ON c.event_id = p.event_id AND c.rn = 1
      |ORDER BY p.event_id""".stripMargin

  /** q40 — FORWARD as-of join with tolerance: for each `view`, the first
    * `purchase` by the same user at-or-after it within 2 h — the
    * view→conversion attribution latency shape (and the mirror of q35's
    * price-at-order lookback), through [[asofJoin]]'s reversed-traversal
    * window path. Same join-free plan: one hash exchange on the key, no
    * inequality-join candidate fanout. */
  def asofConversions(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"),
        round(col("value"), 2).as("purchase_value"))
    asofJoin(views, purchases, "user_id", "us", "event_id",
        toleranceUs = 2L * 3600 * 1000000, forward = true)
      .select(col("event_id"), col("user_id"),
        col("asof.event_id").as("purchase_id"),
        col("asof.purchase_value").as("purchase_value"),
        when(col("asof").isNotNull,
          expr("(asof.us - us) div 1000000")).as("gap_s"))
      .orderBy(col("event_id"))
  }

  /** Mirror of q35's oracle: the naive forward inequality join +
    * row_number, rn ordered (us ASC, event_id ASC) ≙ the reversed
    * window's last-over-(us DESC, id DESC). */
  private val asofConversionsSql =
    """WITH v AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    round(value, 2) AS purchase_value
      |  FROM events WHERE event_type = 'purchase'),
      |cand AS (
      |  SELECT v.event_id, p.event_id AS purchase_id, p.purchase_value,
      |    (p.us - v.us) // 1000000 AS gap_s,
      |    row_number() OVER (PARTITION BY v.event_id
      |      ORDER BY p.us ASC, p.event_id ASC) AS rn
      |  FROM v JOIN p ON p.user_id = v.user_id AND p.us >= v.us
      |    AND p.us - v.us <= 7200000000)
      |SELECT v.event_id, v.user_id, c.purchase_id, c.purchase_value, c.gap_s
      |FROM v LEFT JOIN cand c ON c.event_id = v.event_id AND c.rn = 1
      |ORDER BY v.event_id""".stripMargin

  /** q36 — radius range join (all events within ±5 min of each purchase,
    * any user — keyless, so only the time axis prunes) through
    * [[rangeJoinPairs]]'s bin-bucketed equi-join; per-purchase neighbor
    * count and value mass. Purchases with zero neighbors drop on both
    * sides (inner semantics). Plan-pinned: a hash/merge EQUI-join on the
    * bin, never a nested-loop over the raw inequality. */
  def nearbyEvents(s: SparkSession, d: String): DataFrame = {
    val radiusUs = 5L * 60 * 1000000
    val ev = Tables.events(s, d)
    val all = ev.select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    rangeJoinPairs(purchases, all, "p_us", "us", radiusUs)
      .filter(col("event_id") =!= col("p_id"))
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_nearby"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("p_id").as("event_id"), col("n_nearby"), col("sum_value"))
      .orderBy(col("event_id"))
  }

  private val nearbyEventsSql =
    """WITH e AS (
      |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |  FROM events),
      |p AS (
      |  SELECT event_id AS p_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.p_id AS event_id, count(*) AS n_nearby,
      |  round(sum(e.value), 2) AS sum_value
      |FROM p JOIN e ON abs(e.us - p.p_us) <= 300000000
      |  AND e.event_id != p.p_id
      |GROUP BY 1 ORDER BY event_id""".stripMargin

  /** q37 — retention cohort matrix: users cohorted by first-active day,
    * `n_users` still active at each day offset — the
    * product-analytics staple over the engine's event stream. Two hash
    * aggregations and one key-co-partitioned join, every shuffle keyed
    * by user or (cohort, offset) — both bounded by |users| · |days|,
    * never by raw event volume. */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ev.join(first, "user_id")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  private val retentionCohortsSql =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |fst AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id)
      |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
      |  date_diff('day', f.cohort, e.day) AS day_offset,
      |  count(*) AS n_users
      |FROM ev e JOIN fst f USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q35_asof_join", asofViews, Some(asofViewsSql)),
    QueryDef("q36_range_join", nearbyEvents, Some(nearbyEventsSql)),
    QueryDef("q37_retention_cohorts", retentionCohorts,
      Some(retentionCohortsSql)),
    QueryDef("q40_asof_forward", asofConversions, Some(asofConversionsSql)))
}
