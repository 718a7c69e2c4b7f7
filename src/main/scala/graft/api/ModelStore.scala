package graft.api

import graft.features.Featurize
import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model persistence + prediction path (SURVEY §2.1 S7-S9, §2.9 M8,
  * §2.8 V9) — the engine's replacement for the reference's RDS blobs
  * (ref saveRDS 02_build_models.R:770-772, readRDS + dfm_match predict
  * flow README.md:512-521).
  *
  * Persisted layout under one directory:
  *   kmeans/  — MLlib KMeansModel (native ML persistence)
  *   vocab/   — parquet (term, idx, df, n_docs): the training vocabulary
  *              WITH its document frequencies, so predict-time
  *              vectorization applies the SAME quanteda weighting the
  *              model was trained on. (The reference's documented predict
  *              flow skips TF-IDF weighting at predict time — a train/
  *              predict inconsistency; the engine uses one weighting on
  *              both sides, §7.4-style single-config decision.)
  *
  * Predict-time vocab matching ≙ dfm_match: terms outside the training
  * vocabulary drop out via the join; missing terms zero-fill via the
  * sparse representation.
  */
object ModelStore {

  final case class Saved(model: KMeansModel, vocab: DataFrame, vocabSize: Int)

  /** S9 versioned path convention: f(cluster count, date) — matches the
    * reference's `{k}_topic_{kind}.rds` naming intent
    * (ref 04_cluster_refiner.R:679-700). Date is an explicit argument:
    * path construction stays deterministic. */
  def versionedDir(base: String, k: Int, date: java.time.LocalDate): String =
    s"$base/${k}_topic_model_$date"

  /** The df/N-weighted vocabulary relation [[save]] persists —
    * exposed so an IN-MEMORY [[Saved]] can be constructed from a fit
    * (the s09 round-trip row compares the loaded store's predictions
    * against predictions through this identical in-memory relation,
    * isolating exactly the disk round-trip). `counts` and `docs` are
    * the TRAINING corpus relations the df/N statistics derive from. */
  def vocabWithStats(vocab: DataFrame, counts: DataFrame,
                     docs: DataFrame): DataFrame = {
    val df = counts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    vocab.join(df, "term").crossJoin(broadcast(n))
      .select(col("term"), col("idx"), col("df"), col("n_docs"))
  }

  /** An in-memory [[Saved]] over a fit — the no-disk twin of
    * save-then-load (dimension from the centers, like [[load]]). */
  def inMemory(model: KMeansModel, vocab: DataFrame, counts: DataFrame,
               docs: DataFrame): Saved =
    Saved(model, vocabWithStats(vocab, counts, docs),
      model.clusterCenters.head.size)

  /** Persist model + weighted vocabulary. `counts` and `docs` are the
    * TRAINING corpus relations the df/N statistics derive from. */
  def save(dir: String, model: KMeansModel, vocab: DataFrame,
           counts: DataFrame, docs: DataFrame): Unit = {
    org.apache.spark.ml.clustering.GraftKMeansIO
      .save(s"$dir/kmeans", model)
    vocabWithStats(vocab, counts, docs)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  def load(spark: SparkSession, dir: String): Saved = {
    val vocab = spark.read.parquet(s"$dir/vocab")
    val model =
      org.apache.spark.ml.clustering.GraftKMeansIO.load(s"$dir/kmeans")
    // predict-time vectors must match the TRAINING dimensionality, which
    // can exceed the realized vocabulary (vocabSize > distinct terms) —
    // the centers carry the authoritative dimension
    Saved(model, vocab, model.clusterCenters.head.size)
  }

  /** V9 predict-time vectorization: tokens → counts → vocab match
    * (train-vocab join; OOV terms drop, missing terms zero-fill) →
    * train-corpus quanteda weighting → SparseVector. */
  def vectorize(docs: DataFrame, saved: Saved,
                textCol: String = "text"): DataFrame = {
    val counts = Featurize.termCounts(Featurize.docTerms(docs, textCol))
    val weights = counts.join(saved.vocab, "term")
      .withColumn("weight", col("cnt") * log10(col("n_docs") / col("df")))
      .select(col("doc_id"), col("term"), col("weight"))
    Featurize.vectors(weights, saved.vocab.select(col("term"), col("idx")),
      saved.vocabSize)
  }

  /** M8 nearest-centroid prediction: (doc_id, cluster). */
  def predict(docs: DataFrame, saved: Saved,
              textCol: String = "text"): DataFrame =
    saved.model.transform(vectorize(docs, saved, textCol))
      .select(col("doc_id"),
        col(saved.model.getPredictionCol).as("cluster"))
}
