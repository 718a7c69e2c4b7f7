package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable external-effect operators (SURVEY §2.10 L1-L4): the
  * reference enriches documents and labels clusters through OpenAI HTTP
  * calls (ref 01_extract_features.R:14-232, 02_build_models.R:697-738).
  * The environment is zero-egress, so the default implementations are
  * deterministic (doc-id-keyed template enrichment, top-terms labeling)
  * behind traits a real HTTP enricher would implement instead. Failed /
  * empty inputs propagate null (P7 guard ≙ ref 01:85-88, NA semantics).
  */
trait TextEnricher extends Serializable {
  /** Topic enrichment response for one document, or null on empty input
    * (≙ the reference's NA on failed API calls). */
  def enrich(docId: Long, text: String): String
}

trait ClusterLabeler extends Serializable {
  /** 2-5-word label for a cluster given its ranked top terms. */
  def label(clusterId: Int, topTerms: Seq[String]): String
}

/** Deterministic template enricher. The SAME template exists as a
  * Column expression ([[DeterministicEnricher.enrichCol]]) and DuckDB
  * SQL ([[DeterministicEnricher.enrichSql]]) so the downstream
  * extraction operators are oracle-checkable end to end. */
object DeterministicEnricher extends TextEnricher {
  val Domains = Seq("Energy", "Finance", "Health", "Technology")
  val Level1 = Seq("Storage", "Analytics", "Infrastructure")
  val Level2 = Seq("Batteries", "Forecasting", "Networks", "Diagnostics", "Pipelines")
  val Sectors = Seq("Manufacturing", "Services", "Research")

  override def enrich(docId: Long, text: String): String = {
    if (text == null || text.isEmpty) return null
    val d = Domains((docId % Domains.size).toInt)
    val l1 = Level1((docId % Level1.size).toInt)
    val l2 = Level2((docId % Level2.size).toInt)
    val p = Sectors((docId % Sectors.size).toInt)
    val s = Sectors(((docId + 1) % Sectors.size).toInt)
    s"Domain: $d Level 1: $l1 Level 2: $l2 Sectors: $p, $s"
  }

  private def pick(xs: Seq[String], key: Column, shift: Int = 0): Column =
    element_at(array(xs.map(lit): _*), ((key + shift) % xs.size).cast("int") + 1)

  /** Column form of [[enrich]] (null-guarded — P7). */
  def enrichCol(docId: Column, text: Column): Column =
    when(text.isNull || text === "", lit(null.asInstanceOf[String]))
      .otherwise(concat(
        lit("Domain: "), pick(Domains, docId),
        lit(" Level 1: "), pick(Level1, docId),
        lit(" Level 2: "), pick(Level2, docId),
        lit(" Sectors: "), pick(Sectors, docId),
        lit(", "), pick(Sectors, docId, shift = 1)))

  /** DuckDB form over (doc_id, text) columns. Single line: this fragment
    * is embedded into oracle strings that apply their own stripMargin —
    * a continuation line starting with `||` would lose a pipe there. */
  def enrichSql(id: String, text: String): String = {
    def pickSql(xs: Seq[String], shift: Int = 0): String =
      "[" + xs.map(x => s"'$x'").mkString(", ") + s"][(($id + $shift) % ${xs.size}) + 1]"
    s"CASE WHEN $text IS NULL OR $text = '' THEN NULL " +
      s"ELSE 'Domain: ' || ${pickSql(Domains)} || ' Level 1: ' || ${pickSql(Level1)} || " +
      s"' Level 2: ' || ${pickSql(Level2)} || ' Sectors: ' || ${pickSql(Sectors)} || " +
      s"', ' || ${pickSql(Sectors, 1)} END"
  }
}

/** Deterministic top-terms labeler (≙ the reference's GPT cluster
  * labeling L3, ref 02_build_models.R:697-738, reduced to its
  * deterministic fallback: join the strongest terms). */
object TopTermsLabeler extends ClusterLabeler {
  override def label(clusterId: Int, topTerms: Seq[String]): String =
    topTerms.take(3).mkString(" / ")
}

/** mapPartitions enrichment stage for enrichers with real per-executor
  * state (HTTP clients, model handles) — same O4 lazy-init pattern as
  * [[graft.text.PosStage]]. */
object EnrichStage {
  def enrich(docs: DataFrame, enricher: TextEnricher,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, enricher.enrich(id, text)) })
      .toDF(idCol, "topic_response")
  }
}
