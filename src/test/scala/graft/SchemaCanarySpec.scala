package graft

import graft.sources.{SchemaCanary, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-drift canary behavior: green on the shipped corpus, loud and
  * NAMED on a drifted one (the r8 incident: events.ts flipped to
  * TIMESTAMP_NTZ and surfaced as 9 operator-deep AnalysisExceptions). */
class SchemaCanarySpec extends SparkSpec {
  import spark.implicits._

  test("canary passes on the shipped corpus") {
    SchemaCanary.check(spark, sfTiny) // must not throw
  }

  test("normalizeEventTime maps all three historical ts encodings to TIMESTAMP") {
    val dir = java.nio.file.Files.createTempDirectory("canary").toString

    // TIMESTAMP_NTZ encoding (the r8 corpus): write a tz-less ts
    spark.sql(
      """select 1L as event_id,
        |  timestamp_ntz'2024-01-02 03:04:05.123456' as ts,
        |  7L as user_id, 'click' as event_type, 1.5 as value, '{}' as props
        |""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.refresh() // rewrote a path already read — catalog semantics
    val ntz = Tables.events(spark, dir)
    assert(ntz.schema("ts").dataType === TimestampType)
    // UTC session TZ: the cast is a pure relabeling of the same instant
    assert(ntz.select(unix_micros($"ts")).as[Long].head ===
      1704164645123456L)

    // nanos-as-long encoding (the pre-r8 corpus under nanosAsLong)
    spark.sql(
      """select 1L as event_id, 1704164645123456789L as ts,
        |  7L as user_id, 'click' as event_type, 1.5 as value, '{}' as props
        |""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.refresh()
    val nanos = Tables.events(spark, dir)
    assert(nanos.schema("ts").dataType === TimestampType)
    assert(nanos.select(unix_micros($"ts")).as[Long].head ===
      1704164645123456L)

    // plain TIMESTAMP passes through unchanged
    spark.sql(
      """select 1L as event_id, timestamp'2024-01-02 03:04:05.123456' as ts,
        |  7L as user_id, 'click' as event_type, 1.5 as value, '{}' as props
        |""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.refresh()
    assert(Tables.events(spark, dir).schema("ts").dataType === TimestampType)
  }

  private val AllTables = Seq("events", "documents", "embeddings",
    "lineitem", "orders", "region", "nation", "customer", "supplier", "part")

  private def linkedCorpus(tag: String, except: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    for (t <- AllTables if t != except)
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$sfTiny/$t.parquet"))
    dir
  }

  test("a drifted corpus fails the canary with a named column diff, not an operator error") {
    // deliberately drifted events: ts as STRING (a type normalization
    // cannot absorb) — surfaces as the canary's named drift line
    val dir = linkedCorpus("canary-drift", except = "events")
    spark.sql(
      """select 1L as event_id, '2024-01-02' as ts, 7L as user_id,
        |  'click' as event_type, 1.5 as value, '{}' as props
        |""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { SchemaCanary.check(spark, dir) }
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("events.ts"))
  }

  test("canary names a missing column") {
    val dir = linkedCorpus("canary-missing", except = "documents")
    Tables.documents(spark, sfTiny).drop("lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException] { SchemaCanary.check(spark, dir) }
    assert(e.getMessage.contains("documents.lang"))
    assert(e.getMessage.contains("MISSING"))
  }

  test("canary names an unreadable (missing) table instead of leaking a path error") {
    val dir = linkedCorpus("canary-unreadable", except = "part")
    val e = intercept[IllegalStateException] { SchemaCanary.check(spark, dir) }
    assert(e.getMessage.contains("part: unreadable"))
  }
}
