package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Verify's explicit-failure contract: a query that throws must leave an
  * err sentinel in the dump dir (0 rows, `__graft_err` schema) and a
  * ledger entry — never an omission (the r8 failure mode: CORRECTNESS
  * silently shrank from 122 to 112 rows). */
class VerifySentinelSpec extends SparkSpec {

  test("a throwing query writes a zero-row __graft_err sentinel and a ledger entry") {
    val out = java.nio.file.Files.createTempDirectory("verify-sentinel").toString
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> "deliberate"))
    Verify.dumpOne(spark, "qXX_broken", boom, sfTiny, out, errors)

    assert(errors.contains("qXX_broken"))
    val sentinel = spark.read.parquet(s"$out/qXX_broken")
    assert(sentinel.columns.toSeq === Seq("__graft_err"))
    assert(sentinel.count() === 0L)
  }

  test("a healthy query dumps its real result, no ledger entry") {
    val out = java.nio.file.Files.createTempDirectory("verify-ok").toString
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") }
    Verify.dumpOne(spark, "q00_ok", ok, sfTiny, out, errors)

    assert(errors.isEmpty)
    assert(spark.read.parquet(s"$out/q00_ok").count() === 1L)
  }
}
