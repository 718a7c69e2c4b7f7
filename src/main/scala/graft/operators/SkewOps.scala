package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators (100 TB design surface): salting
  * spreads a hot key across `saltFactor` shuffle partitions. AQE's skew
  * handling covers sort-merge joins adaptively; these are the manual
  * forms for aggregations and broadcast-unfriendly skewed equi-joins,
  * declared as queries whose LOGICAL result is salt-invariant — the
  * oracle runs the plain unsalted SQL, so a hash match proves the
  * rewrite is semantics-preserving.
  */
object SkewOps {

  /** Two-phase salted aggregation: groupBy (key, salt) partial → final
    * groupBy (key). The salt derives from a row-dependent hash — hot
    * keys fan out over `saltFactor` reducers in phase 1, and phase 2
    * only merges `saltFactor` partials per key. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     saltCol: Column, saltFactor: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltCol), lit(saltFactor)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("psum"))
      .groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("vsum"))

  /** Salted equi-join: the (possibly skewed) probe side gets a
    * row-hash salt; the build side is replicated `saltFactor`× with an
    * exploded salt column; the join runs on (key, salt). Row-for-row
    * equivalent to the plain equi-join for any salt assignment. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeSaltSource: Column, saltFactor: Int): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(probeSaltSource), lit(saltFactor)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** q22 — salted two-phase aggregation over the events stream (user_id
    * is the natural skew key in clickstream data). */
  def saltedEventAgg(s: SparkSession, d: String): DataFrame =
    saltedCountSum(Tables.events(s, d),
        col("event_type"), col("value"), col("event_id"), saltFactor = 8)
      .select(col("key").as("event_type"), col("n"),
        round(col("vsum"), 2).as("sum_value"))
      .orderBy(col("event_type"))

  private val saltedEventAggSql =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q23 — salted join of events against per-user stats (a self-derived
    * dimension), then re-aggregated; oracle is the plain join. */
  def saltedUserJoin(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val userDim = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events"))
    saltedJoin(events, userDim, "user_id",
        probeSaltSource = col("event_id"), saltFactor = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("user_events")), 4).as("avg_user_events"))
      .orderBy(col("event_type"))
  }

  private val saltedUserJoinSql =
    """WITH dim AS (SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id)
      |SELECT e.event_type, count(*) AS n,
      |  round(avg(d.user_events), 4) AS avg_user_events
      |FROM events e JOIN dim d USING (user_id)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q22_salted_agg", saltedEventAgg, Some(saltedEventAggSql)),
    QueryDef("q23_salted_join", saltedUserJoin, Some(saltedUserJoinSql)))
}
