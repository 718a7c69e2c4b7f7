package graft.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** UDTF-style POS annotation stage (SURVEY §2.8 V8): one input doc row →
  * one output row per token with its UPOS tag, via mapPartitions with a
  * lazily-initialized per-executor tagger (O4 — heavy models load once
  * per JVM, not once per row; ref 02_test.R:44-84).
  *
  * For the default rule tagger the pure-Column path
  * ([[posKeywords]]) is preferred — it stays inside whole-stage codegen.
  * This stage exists for taggers that genuinely need JVM state (loaded
  * model files), which no Column expression can host.
  */
object PosStage {

  // per-executor-JVM cache, keyed by factory — one tagger per distinct
  // factory per JVM regardless of how many partitions/tasks run on it.
  // (A single unkeyed singleton would hand a second pipeline using a
  // different tagger whatever the first factory created.)
  @transient private lazy val cachedTaggers =
    new java.util.concurrent.ConcurrentHashMap[PosTaggerFactory, PosTagger]()
  private def tagger(factory: PosTaggerFactory): PosTagger =
    cachedTaggers.computeIfAbsent(factory, f => f.create())

  /** Scala-side replica of the [[TextFunctions.cleanText]]+tokens chain
    * for use inside mapPartitions (equivalence tested in PosStageSpec). */
  def tokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val lowered = text.toLowerCase
    val expanded = TextFunctions.contractions.foldLeft(lowered) {
      case (acc, (k, v)) => acc.replace(k, v)
    }
    expanded
      .replaceAll("[^a-z ]", " ")
      .replaceAll("\\s+", " ")
      .trim
      .split(" ").toSeq
      .filter(_.nonEmpty)
  }

  /** (doc_id, token, upos) — one row per token occurrence. */
  def annotate(docs: DataFrame, factory: PosTaggerFactory,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, String)] =
      docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    in.mapPartitions { it =>
      val t = tagger(factory)
      it.flatMap { case (id, text) =>
        tokenize(text).map(tok => (id, tok, t.tag(tok)))
      }
    }.toDF(idCol, "token", "upos")
  }

  /** The reference's cleaned_text_1 derivation (ref 02_build_models.R:69-85):
    * tag → keep NOUN+VERB → first-occurrence-distinct → ", "-join.
    * Pure Column implementation (codegen'd) using the rule tagger. */
  def posKeywords(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val nv = filter(toks, t => RulePosTagger.tagCol(t).isin("NOUN", "VERB"))
    docs.select(col(idCol),
      array_join(array_distinct(nv), ", ").as("pos_keywords"))
  }
}
