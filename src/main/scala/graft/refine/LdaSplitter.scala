package graft.refine

import graft.coherence.ProbCoherence
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive-k LDA cluster splitting (SURVEY §2.9 M2-M5), re-expressing
  * the reference's split_clusters_with_lda_adaptive
  * (ref 02_build_models.R:487-561; refiner variant
  * 04_cluster_refiner.R:323-381): for each low-coherence cluster, sweep
  * k over a range of LDA fits, keep the k with the highest mean topic
  * coherence, and reassign the cluster's docs to their theta-argmax
  * topic as fresh cluster ids.
  *
  * Control flow is driver-orchestrated over cached per-cluster slices
  * (SURVEY §7.4.8 — per-cluster iterative fits don't fit one lazy plan);
  * every per-doc computation stays distributed. MLlib LDA (online/EM)
  * replaces the reference's Gibbs/VEM fits — parity is seeded
  * reproducibility + invariants, not bit-identical topics (§7.4.3). One
  * LDA config is used for sweep and final assignment (the reference
  * inconsistently drops alpha/beta on its final refit — §7.4.5).
  */
object LdaSplitter {

  final case class Params(
      kRange: Range = 2 to 6,
      coherenceThreshold: Double = 0.05,
      minDocsForSplit: Long = 10,
      topM: Int = 5,
      maxIter: Int = 10,
      optimizer: String = "online",
      seed: Long = 1234)

  /** Mean Mimno coherence of a topic set against the cluster's docs:
    * every doc is paired with every topic (D(w) and N range over the
    * whole cluster), then the shared relational coherence decomposition
    * runs per topic. */
  private def avgTopicCoherence(clusterDocTerms: DataFrame, docIds: DataFrame,
                                topicTerms: DataFrame): Double = {
    val topics = topicTerms.select(col("cluster")).distinct()
    val crossAsg = docIds.crossJoin(topics)
    val perTopic = ProbCoherence.perCluster(clusterDocTerms, crossAsg, topicTerms)
    val r = perTopic.agg(avg(col("coherence"))).collect().head
    if (r.isNullAt(0)) Double.NegativeInfinity else r.getDouble(0)
  }

  /** Split every low-coherence cluster. Returns (doc_id, cluster) with
    * split docs reassigned to fresh ids (dense-renumber afterwards —
    * [[Renumber.dense]] — to restore canonical ids).
    *
    * @param docTerms    (doc_id, term) exploded corpus terms
    * @param countVecs   (doc_id, features) term-count vectors (the DTM —
    *                    LDA consumes counts, not TF-IDF)
    * @param assignments (doc_id, cluster)
    * @param scores      per-cluster (coherence, n_docs) from
    *                    [[ProbCoherence.perCluster]]
    * @param vocabTerms  vocab index → term (≤ vocabSize entries)
    */
  def split(docTerms: DataFrame, countVecs: DataFrame, assignments: DataFrame,
            scores: Map[Int, (Double, Long)], vocabTerms: Array[String],
            params: Params = Params()): DataFrame = {
    val spark = assignments.sparkSession
    import spark.implicits._

    val toSplit = scores.collect {
      case (c, (coh, n)) if coh < params.coherenceThreshold && n >= params.minDocsForSplit => c
    }.toSeq.sorted
    if (toSplit.isEmpty) return assignments.select(col("doc_id"), col("cluster"))

    var nextId = scores.keys.max + 1
    var result = assignments.select(col("doc_id"), col("cluster"))
      .filter(!col("cluster").isin(toSplit: _*))

    for (c <- toSplit) {
      val docIds = assignments.filter(col("cluster") === c).select(col("doc_id"))
      val slice = countVecs.join(docIds, "doc_id").localCheckpoint()
      val clusterTerms = docTerms.join(docIds, "doc_id").localCheckpoint()

      // k-sweep: fit once per k, score by mean topic coherence
      val fits = params.kRange.map { k =>
        val model = new LDA().setK(k).setSeed(params.seed)
          .setOptimizer(params.optimizer).setMaxIter(params.maxIter)
          .setFeaturesCol("features")
          .fit(slice)
        val topicTerms = model.describeTopics(params.topM).collect()
          .flatMap { r =>
            val topic = r.getInt(0)
            r.getSeq[Int](1).zipWithIndex.map { case (ti, rank) =>
              (topic, vocabTerms(ti), (rank + 1).toLong)
            }
          }.toSeq.toDF("cluster", "term", "rnk")
        val coh = avgTopicCoherence(clusterTerms, docIds, topicTerms)
        (k, model, coh)
      }
      val (_, best, _) = fits.maxBy(_._3)

      // theta-argmax reassignment (T7) onto fresh ids
      val theta = best.transform(slice)
        .withColumn("arr", vector_to_array(col("topicDistribution")))
        .withColumn("topic",
          (array_position(col("arr"), array_max(col("arr"))) - 1).cast("int"))
      val reassigned = theta.select(col("doc_id"),
        (col("topic") + lit(nextId)).cast(assignments.schema("cluster").dataType).as("cluster"))
      nextId += best.getK
      result = result.unionByName(reassigned)
    }
    result
  }
}
