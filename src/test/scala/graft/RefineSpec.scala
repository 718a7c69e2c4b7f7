package graft

import graft.features.Featurize
import graft.refine.{CosineMerge, LdaSplitter, ModelRefresh, Renumber}
import org.apache.spark.sql.functions._

/** Split/merge/renumber/refresh semantics over the FIXTURES A2 corpus
  * (6 docs, 3 latent topics, initial clusters [1,1,2,2,2,2] — ref
  * 04_cluster_refiner.R:391-418 with forced-split params). */
class RefineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "energy battery power electric charging"),
    (2L, "energy storage renewable power battery"),
    (3L, "finance investment risk banking money"),
    (4L, "stock markets economic growth inflation"),
    (5L, "healthcare hospital treatment diagnosis"),
    (6L, "medicine health doctor therapy")
  ).toDF("doc_id", "text")

  private def fixtureAssignments = Seq(
    (1L, 1), (2L, 1), (3L, 2), (4L, 2), (5L, 2), (6L, 2)
  ).toDF("doc_id", "cluster")

  test("Renumber.dense maps sorted distinct ids to a dense 0-based bijection") {
    val asg = Seq((1L, 7), (2L, 3), (3L, 7), (4L, 42)).toDF("doc_id", "cluster")
    val got = Renumber.dense(asg).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 2))
  }

  test("CosineMerge.mergeMap reproduces first-wins chaining, not closure") {
    // cos(0,1) ≈ 0.8 > t, cos(1,2) ≈ 0.8 > t, cos(0,2) = 0.28 < t
    val centers = Map(
      0 -> Array(1.0, 0.0),
      1 -> Array(0.8, 0.6),
      2 -> Array(0.28, 0.96))
    val mm = CosineMerge.mergeMap(centers, threshold = 0.75)
    // scan (0,1): 1 → 0; (0,2): no; (1,2): everything mapped to 2 → 1.
    // 2 ends at 1 (NOT chained through to 0) — reference semantics.
    assert(mm === Map(0 -> 0, 1 -> 0, 2 -> 1))
    // The chain map is legally NOT idempotent (mm(mm(2)) = 0 ≠ 1) —
    // which is why m08's oracle pins monotonicity and totality, never
    // idempotence: an idempotence flag would flip red on exactly this
    // legal center configuration (r11; the m09 data-coupling lesson)
    assert(mm(mm(2)) !== mm(2), "chain map unexpectedly idempotent")
    assert(mm.forall { case (x, r) => r <= x }, "retarget must go downward")
    assert(mm.keySet === centers.keySet && mm.values.toSet.subsetOf(centers.keySet))
  }

  test("CosineMerge.apply + Renumber yields merged dense assignments") {
    val asg = Seq((1L, 0), (2L, 1), (3L, 2)).toDF("doc_id", "cluster")
    val merged = Renumber.dense(
      CosineMerge.apply(asg, Map(0 -> 0, 1 -> 0, 2 -> 2)))
    val got = merged.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("ModelRefresh.stats recomputes sizes and withinss per cluster") {
    val vecs = Seq(
      (1L, 0, org.apache.spark.ml.linalg.Vectors.dense(0.0, 0.0)),
      (2L, 0, org.apache.spark.ml.linalg.Vectors.dense(2.0, 0.0)),
      (3L, 1, org.apache.spark.ml.linalg.Vectors.dense(5.0, 5.0))
    ).toDF("doc_id", "cluster", "features")
    val got = ModelRefresh.stats(vecs).orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // cluster 0 center = (1,0): withinss = 1 + 1 = 2; cluster 1 singleton = 0
    assert(got === Array((0, 2L, 2.0), (1, 1L, 0.0)))
  }

  test("refinerReport produces a labeled coherence report (M10/A10)") {
    val report = graft.api.ModelPipeline.refinerReport(
      corpus, k = 3, seed = 123, vocabSize = 100,
      params = graft.refine.LdaSplitter.Params(
        kRange = 2 to 2, coherenceThreshold = -10.0, // no split: all coherent enough
        minDocsForSplit = 2, maxIter = 10, optimizer = "em"))
      .collect()
    assert(report.length === 3)
    report.foreach { r =>
      assert(r.getLong(1) >= 1L)                  // n_docs
      assert(r.getString(3).nonEmpty)             // label
    }
    // sorted best-first
    val cohs = report.map(_.getDouble(2)).toSeq
    assert(cohs === cohs.sorted.reverse)
  }

  test("LdaSplitter splits the low-coherence mixed cluster (A2 forced split)") {
    val docTerms = Featurize.docTerms(corpus)
    val counts = Featurize.termCounts(docTerms)
    val weights = Featurize.tfidf(counts, corpus)
    val vocab = Featurize.topVocab(weights, 100)
    val vocabTerms = {
      val n = vocab.count().toInt
      val arr = new Array[String](n)
      vocab.collect().foreach(r => arr(r.getInt(1)) = r.getString(0))
      arr
    }
    val countVecs = Featurize.countVectors(counts, vocab, vocabTerms.length)
    // cluster 1 coherent, cluster 2 mixes finance+health → force its split
    val scores = Map(1 -> (0.95, 2L), 2 -> (0.1, 4L))
    val updated = LdaSplitter.split(
      docTerms, countVecs, fixtureAssignments, scores, vocabTerms,
      LdaSplitter.Params(kRange = 2 to 2, coherenceThreshold = 0.9,
        minDocsForSplit = 2, maxIter = 40, optimizer = "em"))
    val dense = Renumber.dense(updated)
    val byDoc = dense.collect().map(r => (r.getLong(0), r.getInt(1))).toMap

    assert(byDoc.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // ids are dense 0-based
    val ids = byDoc.values.toSet
    assert(ids === (0 until ids.size).toSet)
    // cluster 1 (docs 1,2) survives untouched and together
    assert(byDoc(1L) === byDoc(2L))
    // the mixed cluster produced at least 2 sub-clusters
    val subIds = Set(byDoc(3L), byDoc(4L), byDoc(5L), byDoc(6L))
    assert(subIds.size >= 2, s"cluster 2 did not split: $byDoc")
    assert(!subIds.contains(byDoc(1L)))
  }

  test("fresh split ids never collide with a cluster absent from scores") {
    // regression: cluster 9 (doc 7) has no coherence row (singleton — no
    // scored term pairs); deriving the id base from scores.keys.max alone
    // would start fresh ids at 3 and fuse split docs into cluster 9
    val docTerms = Featurize.docTerms(corpus)
    val counts = Featurize.termCounts(docTerms)
    val weights = Featurize.tfidf(counts, corpus)
    val vocab = Featurize.topVocab(weights, 100)
    val vocabTerms = {
      val n = vocab.count().toInt
      val arr = new Array[String](n)
      vocab.collect().foreach(r => arr(r.getInt(1)) = r.getString(0))
      arr
    }
    val countVecs = Featurize.countVectors(counts, vocab, vocabTerms.length)
    val asg = Seq(
      (1L, 1), (2L, 1), (3L, 2), (4L, 2), (5L, 2), (6L, 9)
    ).toDF("doc_id", "cluster")
    val scores = Map(1 -> (0.95, 2L), 2 -> (0.1, 3L)) // 9 unscored
    val updated = LdaSplitter.split(
      docTerms, countVecs, asg, scores, vocabTerms,
      LdaSplitter.Params(kRange = 2 to 2, coherenceThreshold = 0.9,
        minDocsForSplit = 2, maxIter = 40, optimizer = "em"))
    val byDoc = updated.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // doc 6 keeps its own cluster — no split doc may land on id 9
    assert(byDoc(6L) === 9)
    Seq(3L, 4L, 5L).foreach { d =>
      assert(byDoc(d) > 9, s"doc $d reassigned to ${byDoc(d)} — collides below the true max id")
    }
  }

  test("a poisoned slice degrades to no-split instead of wedging the sweep") {
    // ref 02_build_models.R:530-535 keeps a cluster unsplit when its LDA
    // fit throws; the engine must match — null features make every
    // (2, k) fit fail, and the cluster's docs keep their assignment
    val docTerms = Featurize.docTerms(corpus)
    val counts = Featurize.termCounts(docTerms)
    val weights = Featurize.tfidf(counts, corpus)
    val vocab = Featurize.topVocab(weights, 100)
    val vocabTerms = {
      val n = vocab.count().toInt
      val arr = new Array[String](n)
      vocab.collect().foreach(r => arr(r.getInt(1)) = r.getString(0))
      arr
    }
    val countVecs = Featurize.countVectors(counts, vocab, vocabTerms.length)
    val poisoned = countVecs.withColumn("features",
      when(col("doc_id") >= 3L, lit(null)).otherwise(col("features")))
    val scores = Map(1 -> (0.95, 2L), 2 -> (0.1, 4L))
    val updated = LdaSplitter.split(
      docTerms, poisoned, fixtureAssignments, scores, vocabTerms,
      LdaSplitter.Params(kRange = 2 to 2, coherenceThreshold = 0.9,
        minDocsForSplit = 2, maxIter = 40, optimizer = "em"))
    val byDoc = updated.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val original = fixtureAssignments.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(byDoc === original, "failed fits must leave every assignment unchanged")
  }

  test("a zero fit budget times out the sweep and degrades to no-split") {
    val docTerms = Featurize.docTerms(corpus)
    val counts = Featurize.termCounts(docTerms)
    val weights = Featurize.tfidf(counts, corpus)
    val vocab = Featurize.topVocab(weights, 100)
    val vocabTerms = {
      val n = vocab.count().toInt
      val arr = new Array[String](n)
      vocab.collect().foreach(r => arr(r.getInt(1)) = r.getString(0))
      arr
    }
    val countVecs = Featurize.countVectors(counts, vocab, vocabTerms.length)
    val scores = Map(1 -> (0.95, 2L), 2 -> (0.1, 4L))
    val updated = LdaSplitter.split(
      docTerms, countVecs, fixtureAssignments, scores, vocabTerms,
      LdaSplitter.Params(kRange = 2 to 2, coherenceThreshold = 0.9,
        minDocsForSplit = 2, maxIter = 40, optimizer = "em",
        fitTimeout = scala.concurrent.duration.Duration.Zero))
    val byDoc = updated.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val original = fixtureAssignments.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(byDoc === original, "timed-out fits must leave every assignment unchanged")
  }
}
