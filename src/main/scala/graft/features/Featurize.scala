package graft.features

import graft.functions.TextFunctions
import org.apache.spark.ml.linalg.{SparseVector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational quanteda-style TF-IDF featurization (SURVEY §2.8 V1-V7),
  * re-expressing the reference's tokens(1:3) → dfm → dfm_tfidf →
  * reduce_dfm chain (ref 02_build_models.R:161-180) as lazy Spark plans.
  *
  * Design decisions (SURVEY §7.4):
  *  - quanteda weighting: tfidf = count · log10(N/df)  (not Spark IDF's
  *    smoothed ln form) — scheme parity with dfm_tfidf;
  *  - vocabulary = top-N terms by summed TF-IDF mass (ref reduce_dfm),
  *    NOT CountVectorizer's doc-frequency pruning — different term set;
  *  - stays sparse end to end (the reference accidentally densifies at
  *    02_build_models.R:177 — we deliberately don't).
  *
  * Scale: everything before vector assembly is (doc, term) rows — shuffle
  * keys are terms/docs with bounded skew; the vocabulary index (≤ vocabSize
  * entries) is the only driver-side collect, broadcast back.
  */
object Featurize {

  /** Stopword-filtered unigrams per doc (clean chain + F6). */
  def wordsCol(textCol: Column): Column =
    filter(TextFunctions.tokens(textCol),
      t => !t.isin(TextFunctions.stopWords: _*))

  /** Explode 1+2+3-gram terms per document (quanteda tokens ngrams=1:3,
    * space-joined; ref 02_build_models.R:162). */
  def docTerms(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    // widen a narrow scan before the 1-3-gram fanout (no-op at scale —
    // see Scans.widenForFanout)
    val wide = graft.sources.Scans.widenForFanout(
      docs.select(col(idCol), col(textCol)), col(idCol))
    val toks = wide.select(col(idCol).as("doc_id"), wordsCol(col(textCol)).as("w1"))
    val g3 = TextFunctions.withNgrams(
      TextFunctions.withNgrams(toks, "w1", "w2", 2), "w1", "w3", 3)
    g3.select(col("doc_id"),
        explode(concat(col("w1"), col("w2"), col("w3"))).as("term"))
      .filter(col("term") =!= "")
  }

  /** (doc_id, term, cnt) counts — the DFM in relational form (V3). */
  def termCounts(docTerms: DataFrame): DataFrame =
    docTerms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))

  /** quanteda dfm_tfidf: weight = cnt · log10(N / df) (V5). N arrives as
    * a broadcast 1-row aggregate — no separate eager count() scan. The
    * term→df join is pinned to shuffle-hash: the df relation is one row
    * per DISTINCT 1-3-gram (grows with the corpus — never truly small),
    * and its compressed size sits under the auto-broadcast threshold
    * while the driver-side HashedRelation build of that many long string
    * keys is slow, GC-heavy, and wildly variable. */
  def tfidf(counts: DataFrame, docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val df = counts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    counts.join(df.hint("shuffle_hash"), "term")
      .crossJoin(broadcast(n))
      .withColumn("weight", col("cnt") * log10(col("n_docs") / col("df")))
      .select(col("doc_id"), col("term"), col("weight"))
  }

  /** Top-N vocabulary by summed TF-IDF mass (V7/T1; ref reduce_dfm
    * 02_build_models.R:174-180) → (term, idx) with dense 0-based ids in
    * mass-descending order (term asc tiebreak for determinism).
    * orderBy+limit plans as TakeOrderedAndProject (per-partition top-N,
    * driver merge of ≤n rows) — the term space can be billions of 1-3-grams
    * at 100 TB, so no un-partitioned global sort/window ever sees it; the
    * row_number window only ranks the already-bounded ≤n survivors.
    * Ranking uses the 6dp-rounded mass: float summation order varies with
    * partitioning, so ranking raw sums would make the selected vocabulary
    * itself nondeterministic across runs/engines. */
  def topVocab(weights: DataFrame, n: Int): DataFrame = {
    val top = weights.groupBy(col("term"))
      .agg(round(sum(col("weight")), 6).as("mass"))
      .orderBy(col("mass").desc, col("term"))
      .limit(n)
    val w = Window.orderBy(col("mass").desc, col("term"))
    top.withColumn("idx", row_number().over(w) - 1)
      .select(col("term"), col("idx"))
  }

  private val toSparse =
    udf { (size: Int, idx: Seq[Int], vals: Seq[Double]) =>
      val pairs = idx.zip(vals).sortBy(_._1).toArray
      Vectors.sparse(size, pairs.map(_._1), pairs.map(_._2)).asInstanceOf[SparseVector]
    }

  private def assemble(df: DataFrame, vocab: DataFrame, vocabSize: Int,
                       valCol: Column): DataFrame =
    df.join(vocab, "term")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("idx")).as("is"), collect_list(valCol).as("vs"))
      .select(col("doc_id"), toSparse(lit(vocabSize), col("is"), col("vs")).as("features"))

  /** Assemble per-doc SparseVector TF-IDF features over the fixed
    * vocabulary. Docs with no in-vocab terms are dropped (non-empty-doc
    * filter P4 — ref 04_cluster_refiner.R:33-35). */
  def vectors(weights: DataFrame, vocab: DataFrame, vocabSize: Int): DataFrame =
    assemble(weights, vocab, vocabSize, col("weight"))

  /** Assemble per-doc SparseVector term-COUNT features (the DTM an LDA
    * fit consumes — topic models want counts, not TF-IDF weights). */
  def countVectors(counts: DataFrame, vocab: DataFrame, vocabSize: Int): DataFrame =
    assemble(counts, vocab, vocabSize, col("cnt").cast("double"))

  /** Full featurization: docs → (features DF, vocab DF, weights DF).
    * `weights` is reusable for top-terms/coherence without recompute. */
  def features(docs: DataFrame, vocabSize: Int = 2000,
               textCol: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    // one materialization of the tokenize→ngram→count subtree; the vocab
    // ranking, weight join, and vector assembly all re-read it
    val counts = termCounts(docTerms(docs, textCol)).localCheckpoint()
    val w = tfidf(counts, docs)
    val vocab = topVocab(w, vocabSize)
    val inVocab = w.join(vocab, "term")
    (vectors(w, vocab, vocabSize), vocab, inVocab)
  }
}
