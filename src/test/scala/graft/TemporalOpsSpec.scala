package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

/** Semantic edge cases of the temporal operators — the boundaries the
  * sf-corpus oracle rows are unlikely to hit on their own: equal-time
  * inclusivity, tie-breaks, tolerance expiry, radius boundary
  * inclusion, and pair uniqueness across bin edges. */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest-within-tolerance match, inclusive equal time, max-id tie-break") {
    val left = Seq(
      (10L, 1L, 1000L), // key 1 at t=1000
      (11L, 2L, 500L), // key 2: right rows exist only later -> no match
      (12L, 3L, 900L) // key 3: only an expired (t=100, tol=500) right row
    ).toDF("event_id", "k", "us")
    val right = Seq(
      (1L, 1L, 400L), // older
      (2L, 1L, 1000L), // equal time — must match (inclusive)
      (3L, 1L, 1000L), // equal time, larger id — tie-break winner
      (4L, 2L, 600L), // after left's 500 — unmatched
      (5L, 3L, 100L) // within no tolerance of 900 (gap 800 > 500)
    ).toDF("event_id", "k", "us")
    val out = TemporalOps.asofJoin(left, right, "k", "us", "event_id",
        toleranceUs = 500L)
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L) === Some(3L)) // inclusive + max-id among equal times
    assert(out(11L) === None) // no right row at or before
    assert(out(12L) === None) // only match is beyond tolerance -> nulled
  }

  test("asofJoin forward: earliest-within-tolerance match, inclusive equal time, min-id tie-break") {
    val left = Seq(
      (10L, 1L, 1000L), // key 1 at t=1000
      (11L, 2L, 500L), // key 2: right rows exist only earlier -> no match
      (12L, 3L, 900L) // key 3: only an expired (t=1700, tol=500) right row
    ).toDF("event_id", "k", "us")
    val right = Seq(
      (1L, 1L, 1600L), // later — not the nearest
      (2L, 1L, 1000L), // equal time — must match (inclusive)
      (3L, 1L, 1000L), // equal time, larger id — must LOSE (min-id wins)
      (4L, 2L, 400L), // before left's 500 — unmatched in forward mode
      (5L, 3L, 1700L) // gap 800 > tolerance 500 -> nulled
    ).toDF("event_id", "k", "us")
    val out = TemporalOps.asofJoin(left, right, "k", "us", "event_id",
        toleranceUs = 500L, forward = true)
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L) === Some(2L)) // inclusive + MIN-id among equal times
    assert(out(11L) === None) // no right row at or after
    assert(out(12L) === None) // only match is beyond tolerance -> nulled
  }

  test("asofJoin forward and backward are exact mirrors under time negation") {
    // reflecting every timestamp (t -> -t) must swap the two directions,
    // up to the tie-break (avoided here: distinct times throughout)
    val left = Seq((10L, 1L, 100L), (11L, 1L, 250L), (12L, 1L, 400L))
      .toDF("event_id", "k", "us")
    val right = Seq((1L, 1L, 90L), (2L, 1L, 240L), (3L, 1L, 390L))
      .toDF("event_id", "k", "us")
    def matches(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame, fwd: Boolean): Map[Long, Option[Any]] =
      TemporalOps.asofJoin(l, r, "k", "us", "event_id", 1000L, forward = fwd)
        .select(col("event_id"), col("asof.event_id").as("m"))
        .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val back = matches(left, right, fwd = false)
    val fwdNeg = matches(
      left.withColumn("us", -col("us")), right.withColumn("us", -col("us")),
      fwd = true)
    assert(back === fwdNeg)
  }

  test("asofJoin matches a brute-force reference on seeded random fixtures, both directions") {
    // deterministic randomized property (same style as the clean-chain
    // properties): small key/time domains force heavy collisions —
    // equal-time ties, empty keys, expired tolerances — the exact edges
    // the window's (t, side, id) ordering encodes
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 4; forward <- Seq(false, true)) {
      val tol = 5L + rnd.nextInt(10)
      val left = (1 to 60).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
      val right = (101 to 180).map(i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
      def brute(lk: Long, lt: Long): Option[Long] = {
        val cand = right.filter { case (_, rk, rt) =>
          rk == lk && (if (forward) rt >= lt && rt - lt <= tol
                       else rt <= lt && lt - rt <= tol)
        }
        if (cand.isEmpty) None
        else if (forward)
          // earliest time; min id among equal times
          Some(cand.minBy { case (id, _, rt) => (rt, id) }._1)
        else
          // latest time; MAX id among equal times
          Some(cand.maxBy { case (id, _, rt) => (rt, id) }._1)
      }
      val out = TemporalOps.asofJoin(
          left.toDF("event_id", "k", "us"), right.toDF("event_id", "k", "us"),
          "k", "us", "event_id", tol, forward = forward)
        .select(col("event_id"), col("k"), col("us"),
          col("asof.event_id").as("m"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      left.foreach { case (id, k, t) =>
        assert(out(id) === brute(k, t),
          s"round=$round forward=$forward tol=$tol left=($id,$k,$t): " +
            s"engine=${out(id)} brute=${brute(k, t)}")
      }
    }
  }

  test("asofJoin keeps exactly the left relation's rows") {
    val left = Seq((1L, 7L, 10L), (2L, 7L, 20L), (3L, 8L, 5L))
      .toDF("event_id", "k", "us")
    val right = Seq((9L, 7L, 1L)).toDF("event_id", "k", "us")
    val out = TemporalOps.asofJoin(left, right, "k", "us", "event_id",
      toleranceUs = Long.MaxValue / 2)
    assert(out.count() === 3)
    assert(out.columns.toSeq === Seq("event_id", "k", "us", "asof"))
  }

  test("internal staging names are generated fresh — user columns named __l/__t/__bin work") {
    // columns that collide with every historical internal name; the
    // operators must suffix around them, not clobber or error
    val left = Seq((10L, 1L, 1000L, "x"))
      .toDF("event_id", "k", "us", "__l")
    val right = Seq((2L, 1L, 900L, "y", 7))
      .toDF("event_id", "k", "us", "__t", "__side")
    val out = TemporalOps.asofJoin(left, right, "k", "us", "event_id",
      toleranceUs = 500L)
    assert(out.columns.toSeq === Seq("event_id", "k", "us", "__l", "asof"))
    val row = out.select(col("__l"), col("asof.__t")).collect().head
    assert(row.getString(0) === "x") // user column survives untouched
    assert(row.getString(1) === "y") // right struct keeps user fields

    val probes = Seq((1L, 1000L, 9L)).toDF("p_id", "p_us", "__bin")
    val events = Seq((10L, 950L)).toDF("event_id", "us")
    val hits = TemporalOps.rangeJoinPairs(probes, events, "p_us", "us", 100L)
    assert(hits.columns.contains("__bin")) // user's own __bin preserved
    assert(hits.select(col("__bin")).as[Long].head() === 9L)
  }

  test("asofJoin still rejects a left frame carrying the documented output column asof") {
    val left = Seq((10L, 1L, 1000L, "boom")).toDF("event_id", "k", "us", "asof")
    val right = Seq((2L, 1L, 900L)).toDF("event_id", "k", "us")
    val e = intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(left, right, "k", "us", "event_id", 500L)
    }
    assert(e.getMessage.contains("asof"))
  }

  test("rangeJoinPairs: boundary-inclusive, no duplicate pairs across bins") {
    val probes = Seq((1L, 1000L)).toDF("p_id", "p_us")
    val events = Seq(
      (10L, 900L), // inside
      (11L, 1100L), // exactly +radius — inclusive
      (12L, 899L), // exactly -radius-1 — outside
      (13L, 1101L) // outside
    ).toDF("event_id", "us")
    val hits = TemporalOps.rangeJoinPairs(probes, events, "p_us", "us", 100L)
      .select(col("event_id")).as[Long].collect().sorted
    assert(hits.toSeq === Seq(10L, 11L))
    // a probe whose window spans a bin edge still yields each pair once
    val spanning = Seq((2L, 199L)).toDF("p_id", "p_us") // bins 0 and 1 at w=200
    val dense = (0L to 400L by 50L).map(t => (t, t)).toDF("event_id", "us")
    val matched = TemporalOps.rangeJoinPairs(spanning, dense, "p_us", "us", 100L)
      .select(col("event_id")).as[Long].collect()
    assert(matched.length === matched.distinct.length)
    assert(matched.sorted.toSeq === Seq(100L, 150L, 200L, 250L))
  }

  test("retention cohorts: every cohort has an offset-0 row counting its full cohort") {
    val out = TemporalOps.retentionCohorts(spark, sfTiny)
    val day0 = out.filter(col("day_offset") === 0)
      .agg(sum(col("n_users"))).as[Long].head()
    val users = graft.sources.Tables.events(spark, sfTiny)
      .select(col("user_id")).distinct().count()
    assert(day0 === users) // each user appears in their own cohort's day 0
    // offsets are non-negative and n_users never exceeds the day-0 cohort size
    import org.apache.spark.sql.Row
    val byCohort = out.collect().groupBy { case Row(c, _, _) => c }
    byCohort.values.foreach { rs =>
      val sizes = rs.map { case Row(_, off: Long, n: Long) => off -> n }.toMap
      assert(sizes.keySet.forall(_ >= 0))
      assert(sizes.values.forall(_ <= sizes(0L)))
    }
  }
}
