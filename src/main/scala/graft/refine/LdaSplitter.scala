package graft.refine

import graft.coherence.ProbCoherence
import org.apache.spark.ml.clustering.{LDA, LDAModel}
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
  * Control flow is driver-orchestrated (per-cluster iterative fits don't
  * fit one lazy plan — SURVEY §7.4.8), but the orchestration is BATCHED:
  * one materialization of all split-cluster docs, then the LDA fits
  * (small, per-(cluster,k)), then ONE relational coherence evaluation
  * for every (cluster, k, topic) via synthetic composite keys, then one
  * union of theta-argmax reassignments. A naive per-(cluster,k) loop
  * issues dozens of tiny Spark jobs whose fixed scheduling overhead —
  * not data — dominates; batching keeps job count O(#fits), each fit
  * cheap, and the coherence scan O(1).
  *
  * MLlib LDA (online/EM) replaces the reference's Gibbs/VEM fits —
  * parity is seeded reproducibility + invariants, not bit-identical
  * topics (§7.4.3). One LDA config is used for sweep and final
  * assignment (the reference inconsistently drops alpha/beta on its
  * final refit — §7.4.5).
  *
  * Recorded divergence (§7.4-style): the reference's textmineR fits run
  * with `optimize_alpha = TRUE` (ref 02_build_models.R:339) — Gibbs
  * re-estimates the document-topic concentration every iteration, so
  * alpha adapts to each cluster's topic balance. MLlib's LDA has no
  * per-iteration alpha optimization switch (online VB updates only the
  * variational topic parameters; `docConcentration` stays at its prior,
  * here MLlib's (50/k)+1 default). Consequence: on clusters with very
  * skewed topic proportions the reference's theta sharpens over
  * iterations while this engine's stays governed by the fixed prior —
  * k selection is unaffected (driven by coherence, computed from top
  * terms), but individual doc-topic argmax assignments near the
  * decision boundary can differ. Accepted: the parity bar for the ML
  * family is seeded reproducibility + invariants, not bit-identical
  * topic posteriors.
  *
  * Robustness (ref 02_build_models.R:530-535 wraps each LDA in tryCatch
  * and keeps the cluster unsplit on failure): each fit future is
  * NonFatal-guarded and the await carries `Params.fitTimeout`. A fit
  * that throws or exceeds the deadline is dropped (its Spark jobs are
  * cancelled via a per-sweep job group); a cluster whose every k failed
  * degrades to no-split instead of wedging the driver — the previous
  * `Duration.Inf` await turned one hung LDA job into a stuck pipeline.
  */
object LdaSplitter {

  final case class Params(
      kRange: Range = 2 to 6,
      coherenceThreshold: Double = 0.05,
      minDocsForSplit: Long = 10,
      topM: Int = 5,
      maxIter: Int = 10,
      optimizer: String = "online",
      seed: Long = 1234,
      fitTimeout: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.Duration(10, "min"))

  // synthetic coherence key for (cluster, k, topic) — bounded by
  // k ≤ 999 topics and cluster ids < 2^43
  private def synthKey(c: Int, k: Int, topic: Int): Long =
    (c.toLong * 1000L + k.toLong) * 1000L + topic.toLong

  /** Split every low-coherence cluster. Returns (doc_id, cluster) with
    * split docs reassigned to fresh ids (dense-renumber afterwards —
    * [[Renumber.dense]] — to restore canonical ids).
    *
    * @param docTerms    (doc_id, term) distinct corpus term pairs
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

    // Fresh-id offsets precomputed from the SORTED candidate order; the
    // gaps (clusters splitting into < kRange.max topics) are closed by
    // the dense renumber that follows. The id base comes from the
    // assignments relation, not the coherence map — ProbCoherence omits
    // clusters with < 2 scored top terms, so scores.keys.max can sit
    // below the true max id and fresh ids would collide with it.
    val maxId = math.max(
      scores.keys.max,
      assignments.agg(max(col("cluster")).cast("int")).head().getInt(0))
    val offsets = toSplit.zipWithIndex
      .map { case (c, i) => c -> (maxId + 1 + i * params.kRange.max) }.toMap

    // ONE materialization of every doc that participates in any split.
    // Then right-size the partitioning: each (cluster, k) fit filters a
    // small slice, and an online-LDA iteration is a job over EVERY
    // partition — at the default shuffle width that's thousands of
    // near-empty task launches across the sweep (fits × iterations ×
    // partitions), pure scheduler overhead. ~5k docs per partition keeps
    // tiny sweeps on a handful of tasks while a 100 TB cluster's split
    // slices still fan out proportionally to their size.
    val checkpointed = countVecs
      .join(assignments.filter(col("cluster").isin(toSplit: _*))
        .select(col("doc_id"), col("cluster")), "doc_id")
      .localCheckpoint()
    val nParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      checkpointed.count() / 5000L + 1L)).toInt
    val splitDocs = checkpointed.coalesce(nParts)

    // all (cluster, k) fits — each on a lazy filter of the checkpointed
    // slice, so no per-slice materialization job. The fits are
    // independent and individually tiny (a few hundred docs each), so
    // their cost is Spark job-scheduling latency, not compute — submit
    // them CONCURRENTLY from a bounded driver pool and let the scheduler
    // interleave the small jobs across the idle executor threads.
    val fitPairs = for { c <- toSplit; k <- params.kRange } yield (c, k)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, fitPairs.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // Failure containment ≙ the reference's tryCatch-keep-cluster (ref
    // 02_build_models.R:530-535): a fit that throws yields None; the
    // await is bounded by ONE shared fitTimeout deadline across the
    // sweep, and on the first timeout the whole job group is cancelled —
    // remaining futures then drain as immediate timeouts/failures
    // instead of wedging the driver the way Duration.Inf did.
    val jobGroup = s"lda-split-${java.util.UUID.randomUUID()}"
    // Once the sweep deadline fires, fits still QUEUED behind the pool's
    // active threads must not start: cancelJobGroup only reaches jobs
    // already submitted, so a late-starting fit would re-enter the group
    // and submit fresh (now-orphaned) Spark jobs after split() returned.
    @volatile var sweepCancelled = false
    val models: Map[(Int, Int), LDAModel] =
      try {
        val futs = fitPairs.map { case (c, k) =>
          scala.concurrent.Future {
            if (sweepCancelled)
              throw new java.util.concurrent.CancellationException(
                s"sweep cancelled before fit cluster=$c k=$k started")
            spark.sparkContext.setJobGroup(jobGroup,
              s"LDA sweep fit cluster=$c k=$k", interruptOnCancel = true)
            try {
              val slice = splitDocs.filter(col("cluster") === c).select("doc_id", "features")
              Some((c, k) -> new LDA().setK(k).setSeed(params.seed)
                .setOptimizer(params.optimizer).setMaxIter(params.maxIter)
                .setFeaturesCol("features")
                .fit(slice))
            } catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(
                  s"[lda-split] fit cluster=$c k=$k failed (degrading): $e")
                None
            } finally spark.sparkContext.clearJobGroup()
          }
        }
        val deadline = System.nanoTime() + params.fitTimeout.toNanos
        val drained = futs.flatMap { f =>
          val remaining = math.max(0L, deadline - System.nanoTime())
          try scala.concurrent.Await
            .result(f, scala.concurrent.duration.Duration.fromNanos(remaining))
          catch {
            case _: java.util.concurrent.TimeoutException =>
              System.err.println(
                s"[lda-split] sweep exceeded ${params.fitTimeout} — " +
                  "cancelling outstanding fits, unfitted clusters stay unsplit")
              sweepCancelled = true
              spark.sparkContext.cancelJobGroup(jobGroup)
              None
            case _: java.util.concurrent.CancellationException => None
          }
        }.toMap
        // a fit that slipped in between the flag and its check may have
        // submitted jobs after the cancel above — sweep the group again
        // now that no new member can start
        if (sweepCancelled) spark.sparkContext.cancelJobGroup(jobGroup)
        drained
      } finally pool.shutdownNow()

    // clusters with at least one surviving fit; the rest keep their
    // original assignment (degrade-to-unsplit)
    val fitted = toSplit.filter(c => params.kRange.exists(k => models.contains((c, k))))
    if (fitted.isEmpty) return assignments.select(col("doc_id"), col("cluster"))

    // ONE coherence evaluation for every (cluster, k, topic):
    // topic top-terms under synthetic keys + docs-of-c × keys-of-c
    // cross-assignment, through the shared relational decomposition
    val topicTermRows = models.toSeq.flatMap { case ((c, k), m) =>
      m.describeTopics(params.topM).collect().flatMap { r =>
        val topic = r.getInt(0)
        r.getSeq[Int](1).zipWithIndex.map { case (ti, rank) =>
          (synthKey(c, k, topic), vocabTerms(ti), (rank + 1).toLong)
        }
      }
    }
    val topicTerms = topicTermRows.toDF("cluster", "term", "rnk")
    val keyRows = models.toSeq.flatMap { case ((c, k), m) =>
      (0 until m.getK).map(t => (c, synthKey(c, k, t)))
    }
    val keys = keyRows.toDF("orig_cluster", "cluster")
    val crossAsg = assignments.filter(col("cluster").isin(fitted: _*))
      .select(col("doc_id"), col("cluster").as("orig_cluster"))
      .join(broadcast(keys), "orig_cluster")
      .select(col("doc_id"), col("cluster"))
    val perTopic = ProbCoherence.perCluster(docTerms, crossAsg, topicTerms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // best k per cluster by mean topic coherence over the SURVIVING fits
    // (topics with no scored pairs contribute nothing; a (c,k) with no
    // scores at all falls back to the smallest surviving k)
    val bestK: Map[Int, Int] = fitted.map { c =>
      val scored = params.kRange.flatMap { k =>
        models.get((c, k)).map { m =>
          val topicScores = (0 until m.getK)
            .flatMap(t => perTopic.get(synthKey(c, k, t)))
          k -> (if (topicScores.isEmpty) Double.NegativeInfinity
                else topicScores.sum / topicScores.size)
        }
      }
      c -> scored.maxBy(_._2)._1
    }.toMap

    // theta-argmax reassignment (T7) onto each cluster's fresh id range,
    // one lazy union materialized by the caller
    val reassigned = fitted.map { c =>
      val slice = splitDocs.filter(col("cluster") === c).select("doc_id", "features")
      models((c, bestK(c))).transform(slice)
        .withColumn("arr", vector_to_array(col("topicDistribution")))
        .withColumn("topic",
          (array_position(col("arr"), array_max(col("arr"))) - 1).cast("int"))
        .select(col("doc_id"),
          (col("topic") + lit(offsets(c)))
            .cast(assignments.schema("cluster").dataType).as("cluster"))
    }

    val kept = assignments.select(col("doc_id"), col("cluster"))
      .filter(!col("cluster").isin(fitted: _*))
    reassigned.foldLeft(kept)(_ unionByName _)
  }
}
