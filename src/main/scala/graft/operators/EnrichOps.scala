package graft.operators

import graft.QueryDef
import graft.enrich.DeterministicEnricher
import graft.ml.MlQueries
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Enrichment / labeling operator family (SURVEY §2.10 L1-L4 + §2.2 P1/P7
  * + §2.7 F7/F11/F12 + §2.3 J1): the reference's LLM feature-extraction
  * pipeline (ref 01_extract_features.R:14-232, 277-292) re-expressed with
  * the deterministic enricher so every stage is oracle-checkable.
  */
object EnrichOps {

  /** f01 — L1 + F7 + P1: enrich → regex field extraction (Domain /
    * Level_1 / Level_2 / sectors) → combined_features concat
    * (ref 01_extract_features.R:277-292; concat_ws skips nulls where R
    * paste renders "NA" — documented divergence, SURVEY §7.4.2). */
  def extractFields(s: SparkSession, d: String): DataFrame = {
    val resp = DeterministicEnricher.enrichCol(col("doc_id"), col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), resp.as("resp"))
      .select(col("doc_id"),
        regexp_extract(col("resp"), "Domain: (.*?) Level 1:", 1).as("domain"),
        regexp_extract(col("resp"), "Level 1: (.*?) Level 2:", 1).as("level_1"),
        regexp_extract(col("resp"), "Level 2: (.*?) Sectors:", 1).as("level_2"),
        regexp_extract(col("resp"), "Sectors: (.*?), ", 1).as("primary_sector"),
        regexp_extract(col("resp"), "Sectors: .*?, (.*)$", 1).as("secondary_sector"))
      .withColumn("combined_features",
        concat_ws(" ", col("domain"), col("level_1"), col("level_2"),
          col("primary_sector"), col("secondary_sector")))
      .orderBy(col("doc_id"))
  }

  private val extractFieldsSql = {
    val resp = DeterministicEnricher.enrichSql("doc_id", "text")
    s"""WITH e AS (SELECT doc_id, $resp AS resp FROM documents)
       |SELECT doc_id,
       |  regexp_extract(resp, 'Domain: (.*?) Level 1:', 1) AS domain,
       |  regexp_extract(resp, 'Level 1: (.*?) Level 2:', 1) AS level_1,
       |  regexp_extract(resp, 'Level 2: (.*?) Sectors:', 1) AS level_2,
       |  regexp_extract(resp, 'Sectors: (.*?), ', 1) AS primary_sector,
       |  regexp_extract(resp, 'Sectors: .*?, (.*)$$', 1) AS secondary_sector,
       |  concat_ws(' ',
       |    regexp_extract(resp, 'Domain: (.*?) Level 1:', 1),
       |    regexp_extract(resp, 'Level 1: (.*?) Level 2:', 1),
       |    regexp_extract(resp, 'Level 2: (.*?) Sectors:', 1),
       |    regexp_extract(resp, 'Sectors: (.*?), ', 1),
       |    regexp_extract(resp, 'Sectors: .*?, (.*)$$', 1)) AS combined_features
       |FROM e ORDER BY doc_id""".stripMargin
  }

  /** f02 — L4 + F11: manual-labeling prompt export — one text block
    * listing each cluster's top-5 terms (ref 02_build_models.R:229-246,
    * 654-671), built with order-pinned aggregation (sort_array over
    * (rnk, term) structs — collect_list alone is partition-order-
    * dependent). */
  def labelPrompts(s: SparkSession, d: String): DataFrame = {
    val top = graft.cluster.ClusterPipeline.topTerms(
      MlQueries.weights(s, d), MlQueries.hashClusters(Tables.documents(s, d)), 5)
    top.groupBy(col("cluster"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rnk"), col("term")))),
          x => x("term")), ", ").as("terms"))
      .select(concat(lit("Cluster "), col("cluster"), lit(": "), col("terms")).as("line"),
        col("cluster"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("cluster"), col("line")))),
          x => x("line")), "\n").as("prompt"))
  }

  private val labelPromptsSql =
    "WITH " + MlQueries.termsCte + """,
      |asg AS (SELECT doc_id, doc_id % 10 AS cluster FROM documents),
      |cmass AS (SELECT cluster, term, round(sum(weight), 6) AS mass
      |          FROM weights JOIN asg USING (doc_id) GROUP BY cluster, term),
      |top AS (SELECT cluster, term, rnk FROM (
      |        SELECT cluster, term, mass,
      |               row_number() OVER (PARTITION BY cluster ORDER BY mass DESC, term) AS rnk
      |        FROM cmass) z WHERE rnk <= 5),
      |lines AS (SELECT cluster,
      |            'Cluster ' || cluster || ': ' || string_agg(term, ', ' ORDER BY rnk) AS line
      |          FROM top GROUP BY cluster)
      |SELECT string_agg(line, chr(10) ORDER BY cluster) AS prompt FROM lines""".stripMargin

  /** f03 — L3 + J1 + F12: deterministic top-terms cluster labels,
    * broadcast-joined back onto every document (the reference's
    * cluster_labels lookup, ref 02_build_models.R:741-767). */
  def docLabels(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val asg = MlQueries.hashClusters(docs)
    val top3 = graft.cluster.ClusterPipeline.topTerms(MlQueries.weights(s, d), asg, 3)
    val labels = top3.groupBy(col("cluster"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rnk"), col("term")))),
          x => x("term")), " / ").as("label"))
    asg.join(broadcast(labels), "cluster")
      .select(col("doc_id"), col("cluster"),
        concat(lit("Cluster_"), col("cluster"), lit(": "), col("label")).as("label"))
      .orderBy(col("doc_id"))
  }

  private val docLabelsSql =
    "WITH " + MlQueries.termsCte + """,
      |asg AS (SELECT doc_id, doc_id % 10 AS cluster FROM documents),
      |cmass AS (SELECT cluster, term, round(sum(weight), 6) AS mass
      |          FROM weights JOIN asg USING (doc_id) GROUP BY cluster, term),
      |top AS (SELECT cluster, term, rnk FROM (
      |        SELECT cluster, term, mass,
      |               row_number() OVER (PARTITION BY cluster ORDER BY mass DESC, term) AS rnk
      |        FROM cmass) z WHERE rnk <= 3),
      |labels AS (SELECT cluster,
      |             string_agg(term, ' / ' ORDER BY rnk) AS label
      |           FROM top GROUP BY cluster)
      |SELECT a.doc_id, a.cluster,
      |  'Cluster_' || a.cluster || ': ' || l.label AS label
      |FROM asg a JOIN labels l USING (cluster)
      |ORDER BY a.doc_id""".stripMargin

  /** f04 — L2 as the reference wrote it (SURVEY §1.2): the sector
    * response is materialized as a transient `STRUCT<primary_sector,
    * secondary_sector>` and then flattened with `select("s.*")`
    * (ref 01_extract_features.R:283-292 builds a two-field list column
    * and unnests it wider). The struct exists only in the plan — Catalyst
    * prunes it to its fields, so the round-trip costs nothing — but it
    * closes the letter of the reference's transient-struct row where f01
    * extracts flat columns directly. */
  def sectorStruct(s: SparkSession, d: String): DataFrame = {
    val resp = DeterministicEnricher.enrichCol(col("doc_id"), col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), resp.as("resp"))
      .withColumn("sector_response", struct(
        regexp_extract(col("resp"), "Sectors: (.*?), ", 1).as("primary_sector"),
        regexp_extract(col("resp"), "Sectors: .*?, (.*)$", 1).as("secondary_sector")))
      .select(col("doc_id"), col("sector_response.*"))
      .orderBy(col("doc_id"))
  }

  private val sectorStructSql = {
    val resp = DeterministicEnricher.enrichSql("doc_id", "text")
    s"""WITH e AS (SELECT doc_id, $resp AS resp FROM documents)
       |SELECT doc_id,
       |  regexp_extract(resp, 'Sectors: (.*?), ', 1) AS primary_sector,
       |  regexp_extract(resp, 'Sectors: .*?, (.*)$$', 1) AS secondary_sector
       |FROM e ORDER BY doc_id""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("f01_extract_fields", extractFields, Some(extractFieldsSql)),
    QueryDef("f02_label_prompts", labelPrompts, Some(labelPromptsSql)),
    QueryDef("f03_doc_labels", docLabels, Some(docLabelsSql)),
    QueryDef("f04_sector_struct", sectorStruct, Some(sectorStructSql)))
}
