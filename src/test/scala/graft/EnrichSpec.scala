package graft

import graft.enrich.{DeterministicEnricher, EnrichStage, TopTermsLabeler}
import org.apache.spark.sql.functions._

/** Enricher trait semantics: scala/Column agreement, null guard, and
  * the mapPartitions stage equivalence. */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("scala enrich and Column enrichCol agree; empty input yields null") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (7L, "gamma"), (42L, ""),
      (13L, "delta")).toDF("doc_id", "text")
    val viaCol = docs
      .select(col("doc_id"),
        DeterministicEnricher.enrichCol(col("doc_id"), col("text")).as("r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toMap
    Seq((0L, "alpha"), (1L, "beta"), (7L, "gamma"), (42L, ""), (13L, "delta"))
      .foreach { case (id, text) =>
        assert(viaCol(id) === DeterministicEnricher.enrich(id, text), s"doc $id")
      }
    assert(viaCol(42L) === null)
  }

  test("EnrichStage matches the Column form over the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfTiny).limit(40)
    val viaStage = EnrichStage.enrich(docs, DeterministicEnricher)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val viaCol = docs
      .select(col("doc_id"),
        DeterministicEnricher.enrichCol(col("doc_id"), col("text")).as("r"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaStage === viaCol)
  }

  test("enrich template round-trips through the field extractors") {
    val enriched = DeterministicEnricher.enrich(5L, "some text")
    val got = Seq((5L, enriched)).toDF("doc_id", "resp")
      .select(
        regexp_extract(col("resp"), "Domain: (.*?) Level 1:", 1).as("d"),
        regexp_extract(col("resp"), "Level 1: (.*?) Level 2:", 1).as("l1"),
        regexp_extract(col("resp"), "Level 2: (.*?) Sectors:", 1).as("l2"),
        regexp_extract(col("resp"), "Sectors: (.*?), ", 1).as("p"),
        regexp_extract(col("resp"), "Sectors: .*?, (.*)$", 1).as("s"))
      .collect().head
    assert(got.getString(0) === DeterministicEnricher.Domains((5 % 4).toInt))
    assert(got.getString(1) === DeterministicEnricher.Level1((5 % 3).toInt))
    assert(got.getString(2) === DeterministicEnricher.Level2(0)) // 5 % 5
    assert(got.getString(3) === DeterministicEnricher.Sectors((5 % 3).toInt))
    assert(got.getString(4) === DeterministicEnricher.Sectors((6 % 3).toInt))
  }

  test("TopTermsLabeler joins the strongest three terms") {
    assert(TopTermsLabeler.label(1, Seq("energy", "battery", "power", "x"))
      === "energy / battery / power")
  }
}
