package graft.api

import graft.cluster.ClusterPipeline
import graft.coherence.ProbCoherence
import graft.features.Featurize
import graft.refine.{CosineMerge, LdaSplitter, ModelRefresh, Renumber}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end modeling pipeline (SURVEY §3.2 entry point 2 + §2.9
  * M9/M10): featurize → K-means → coherence → adaptive LDA split →
  * renumber → refresh → cosine merge → renumber → refresh → report.
  * Mirrors the reference's optimize_clusters_with_coherence
  * (ref ...optimised_clusters.R:831-900) and runPhase1Pipeline
  * (ref 04_cluster_refiner.R:726-774) as one driver-orchestrated
  * composition over lazy distributed stages.
  */
object ModelPipeline {

  /** Everything downstream stages need, fitted once. `counts` is the
    * single materialization point: every downstream stage (weights,
    * vocab, vectors, coherence presence) derives from it, so the
    * tokenize→ngram→count subtree runs exactly once per pipeline instead
    * of once per stage. `docTerms` for coherence is counts-projected —
    * coherence binarizes anyway, and counts already holds distinct
    * (doc, term) pairs. */
  final case class Fitted(
      docTerms: DataFrame,    // (doc_id, term) distinct pairs
      counts: DataFrame,      // (doc_id, term, cnt), checkpointed
      weights: DataFrame,     // (doc_id, term, weight)
      vocab: DataFrame,       // (term, idx)
      vocabTerms: Array[String],
      assignments: DataFrame, // (doc_id, cluster, features)
      model: org.apache.spark.ml.clustering.KMeansModel)

  def fit(docs: DataFrame, k: Int = 15, seed: Long = 123,
          vocabSize: Int = 2000): Fitted = {
    val counts = Featurize.termCounts(Featurize.docTerms(docs)).localCheckpoint()
    val docTerms = counts.select(col("doc_id"), col("term"))
    val weights = Featurize.tfidf(counts, docs)
    val vocab = Featurize.topVocab(weights, vocabSize).localCheckpoint()
    val vocabTerms = {
      val arr = new Array[String](vocab.count().toInt)
      vocab.collect().foreach(r => arr(r.getInt(1)) = r.getString(0))
      arr
    }
    val feats = Featurize.vectors(weights, vocab, vocabSize).localCheckpoint()
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(feats)
    Fitted(docTerms, counts, weights, vocab, vocabTerms,
      model.transform(feats), model)
  }

  /** Per-cluster coherence over the top-M TF-IDF terms (A8 + A10). */
  def coherence(fm: Fitted, topM: Int = 5): DataFrame =
    ProbCoherence.perCluster(
      fm.docTerms,
      fm.assignments.select(col("doc_id"), col("cluster")),
      ClusterPipeline.topTerms(fm.weights, fm.assignments, topM))

  /** Adaptive LDA split of low-coherence clusters, then dense renumber.
    * Returns refreshed (doc_id, cluster, features). */
  def split(fm: Fitted, params: LdaSplitter.Params): DataFrame = {
    val scores = coherence(fm, params.topM).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val countVecs = Featurize.countVectors(fm.counts, fm.vocab,
      fm.vocabTerms.length)
    val updated = LdaSplitter.split(
      fm.docTerms, countVecs,
      fm.assignments.select(col("doc_id"), col("cluster")),
      scores, fm.vocabTerms, params)
    Renumber.dense(updated)
      .join(fm.assignments.select(col("doc_id"), col("features")), "doc_id")
  }

  /** Cosine merge of redundant clusters, then dense renumber. */
  def merge(assignments: DataFrame, threshold: Double = 0.9): DataFrame = {
    val centers = CosineMerge.collectCenters(assignments)
    val mm = CosineMerge.mergeMap(centers, threshold)
    Renumber.dense(CosineMerge.apply(assignments, mm))
  }

  /** Full optimization: split → merge → per-cluster stats
    * (cluster, n_docs, withinss), ordered. */
  def optimize(docs: DataFrame, k: Int = 15, seed: Long = 123,
               vocabSize: Int = 2000,
               params: LdaSplitter.Params = LdaSplitter.Params(),
               mergeThreshold: Double = 0.9): DataFrame = {
    val fm = fit(docs, k, seed, vocabSize)
    val afterSplit = split(fm, params)
    val afterMerge = merge(afterSplit, mergeThreshold)
    ModelRefresh.stats(afterMerge).orderBy(col("cluster"))
  }
}
