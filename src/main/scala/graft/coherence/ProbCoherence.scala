package graft.coherence

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic topic coherence (SURVEY §2.4 A8) with textmineR
  * CalcProbCoherence semantics (the function the reference calls at
  * 02_build_models.R:346,528 and 04_cluster_refiner.R:211): for a
  * topic/cluster's top-M terms ranked w₁..w_M, the mean over ordered
  * pairs i<j of  P(wⱼ|wᵢ) − P(wⱼ)  computed from binarized per-document
  * term presence. High co-occurrence of top terms ⇒ coherent cluster.
  *
  * Relational decomposition (no Spark built-in exists): term presence →
  * per-cluster doc counts D(w) → pair co-occurrence D(wᵢ,wⱼ) via a
  * self-join on (cluster, doc) restricted to the top-M terms (M ≤ 5 ⇒ at
  * most M(M−1)/2 = 10 pairs per cluster — the join is tiny regardless of
  * corpus size, SURVEY §4.1).
  */
object ProbCoherence {

  /** @param docTerms    (doc_id, term) — may contain duplicates; binarized here
    * @param assignments (doc_id, cluster)
    * @param topTerms    (cluster, term, rnk) ranked top-M terms per cluster
    * @return (cluster, coherence, n_docs)
    */
  def perCluster(docTerms: DataFrame, assignments: DataFrame,
                 topTerms: DataFrame): DataFrame = {
    // topTerms is ≤ clusters × M rows but its DAG can be corpus-scale
    // (weights join + groupBy + window) — and it is read TWICE below
    // (term-prune broadcast + presence join), so materialize it once.
    val top = topTerms.localCheckpoint()
    // Prune FIRST: only rows whose term is some cluster's top term can
    // contribute. The distinct top-term set is ≤ clusters × M values —
    // broadcast it and cut the corpus-sized docTerms relation down
    // BEFORE the doc_id shuffle joins (at 100 TB this is the difference
    // between shuffling the whole corpus and shuffling a sliver).
    val anyTop = broadcast(top.select(col("term")).distinct())
    // presence is re-read by four branches (dw, both sides of the cooc
    // self-join, and pairs via dw) — materialize it once. It is tiny by
    // construction: ≤ n_docs × M rows (M = top terms per cluster).
    val presence = docTerms
      .join(anyTop, "term")
      .join(assignments.select(col("doc_id"), col("cluster")), "doc_id")
      .join(top.select(col("cluster"), col("term"), col("rnk")), Seq("cluster", "term"))
      .select(col("cluster"), col("doc_id"), col("term"), col("rnk"))
      .distinct()
      .localCheckpoint()
    val nDocs = assignments.groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
    val dw = presence.groupBy(col("cluster"), col("term"), col("rnk"))
      .agg(count(lit(1)).as("d"))
    // co-occurrence: docs containing both wᵢ (rank i) and wⱼ (rank j>i)
    val cooc = presence.as("a")
      .join(presence.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.doc_id") === col("b.doc_id") && col("a.rnk") < col("b.rnk"))
      .groupBy(col("a.cluster").as("cluster"),
        col("a.rnk").as("ri"), col("b.rnk").as("rj"))
      .agg(count(lit(1)).as("dij"))
    // all ordered pairs (including zero co-occurrence): cross of ranks
    val pairs = dw.as("i").join(dw.as("j"),
        col("i.cluster") === col("j.cluster") && col("i.rnk") < col("j.rnk"))
      .select(col("i.cluster").as("cluster"),
        col("i.rnk").as("ri"), col("j.rnk").as("rj"),
        col("i.d").as("di"), col("j.d").as("dj"))
    pairs
      .join(cooc, Seq("cluster", "ri", "rj"), "left")
      .withColumn("dij", coalesce(col("dij"), lit(0L)))
      .join(nDocs, "cluster")
      .withColumn("score", col("dij") / col("di") - col("dj") / col("n_docs"))
      .groupBy(col("cluster"), col("n_docs"))
      .agg(round(avg(col("score")), 6).as("coherence"))
      .select(col("cluster"), col("coherence"), col("n_docs"))
  }
}
