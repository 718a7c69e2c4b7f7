package graft

import graft.text.{PosStage, RulePosTagger, RulePosTaggerFactory}
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The three rule-tagger forms (scala, Column, SQL-oracle) must agree,
  * and the mapPartitions stage must init its tagger once per JVM. */
class PosStageSpec extends SparkSpec {
  import spark.implicits._

  test("scala tag and Column tagCol agree on a token sample") {
    val tokens = Seq("running", "jumped", "optimize", "classify", "quickly",
      "famous", "helpful", "active", "readable", "possible", "basic",
      "table", "red", "bed", "ing", "sly", "energy", "spark", "x")
    val viaCol = tokens.toDF("t")
      .select(col("t"), RulePosTagger.tagCol(col("t")).as("tag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    tokens.foreach { t =>
      assert(viaCol(t) === RulePosTagger.tag(t), s"token '$t'")
    }
  }

  test("PosStage.tokenize replicates the Column clean+tokens chain") {
    val texts = Seq("Hello, World! 123", "  spaced   out  ", "", "don't",
      "MiXeD CaSe-text")
    val viaCol = texts.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(texts.map(PosStage.tokenize) === viaCol)
  }

  test("annotate emits one tagged row per token; tagger inits once per JVM") {
    val docs = Seq((1L, "running the table quickly"), (2L, "famous spark"))
      .toDF("doc_id", "text")
    RulePosTaggerFactory.created.set(0)
    val got = PosStage.annotate(docs, new RulePosTaggerFactory)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "running", "VERB"), (1L, "the", "NOUN"),
      (1L, "table", "NOUN"), (1L, "quickly", "ADV"),
      (2L, "famous", "ADJ"), (2L, "spark", "NOUN")))
    // driver-side JVM in local mode: exactly one instantiation
    assert(RulePosTaggerFactory.created.get() <= 1)
  }

  test("posKeywords keeps NOUN+VERB first-occurrence order") {
    val docs = Seq((1L, "Running table famous table running spark"))
      .toDF("doc_id", "text")
    val got = PosStage.posKeywords(docs).collect().head.getString(1)
    assert(got === "running, table, spark")
  }

  test("posKeywords over the corpus matches the mapPartitions stage") {
    val docs = Tables.documents(spark, sfTiny).limit(50)
    // keyword SETS must agree (collect_list order is partition-dependent,
    // so the stage side can't reproduce the joined string's order)
    val viaCol = PosStage.posKeywords(docs)
      .collect().map(r => (r.getLong(0), r.getString(1).split(", ").toSet)).toMap
    val viaStage = PosStage.annotate(docs, new RulePosTaggerFactory)
      .filter(col("upos").isin("NOUN", "VERB"))
      .groupBy("doc_id")
      .agg(collect_set(col("token")).as("kw"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    assert(viaStage === viaCol.filter { case (_, v) => v.nonEmpty && v != Set("") })
  }
}
