package graft

import graft.api.{ModelPipeline, ModelStore}
import org.apache.spark.sql.functions._

/** Save → load → predict round-trip (SURVEY S7/S8/S9 + M8/V9): a
  * reloaded model must reproduce the training assignments exactly when
  * predicting on the training corpus (same vocabulary, same df/N
  * weighting, same centers). */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "energy battery power electric charging"),
    (2L, "energy storage renewable power battery"),
    (3L, "finance investment risk banking money"),
    (4L, "stock markets economic growth inflation"),
    (5L, "healthcare hospital treatment diagnosis"),
    (6L, "medicine health doctor therapy")
  ).toDF("doc_id", "text")

  test("versionedDir encodes cluster count and date") {
    val p = ModelStore.versionedDir("/models", 19, java.time.LocalDate.of(2026, 8, 12))
    assert(p === "/models/19_topic_model_2026-08-12")
  }

  test("save → load → predict reproduces training assignments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val fm = ModelPipeline.fit(corpus, k = 3, seed = 123, vocabSize = 100)
    val trained = fm.assignments.select("doc_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap

    ModelStore.save(dir, fm.model, fm.vocab, fm.counts, corpus)
    val saved = ModelStore.load(spark, dir)
    // declared train-time dimensionality, not the (smaller) realized vocab
    assert(saved.vocabSize === 100)

    val predicted = ModelStore.predict(corpus, saved).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(predicted === trained)
  }

  test("inMemory Saved is the no-disk twin of save → load (s09's contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val fm = ModelPipeline.fit(corpus, k = 3, seed = 123, vocabSize = 100)
    ModelStore.save(dir, fm.model, fm.vocab, fm.counts, corpus)
    val loaded = ModelStore.load(spark, dir)
    val mem = ModelStore.inMemory(fm.model, fm.vocab, fm.counts, corpus)
    assert(mem.vocabSize === loaded.vocabSize)
    // identical predictions on the training corpus
    val a = ModelStore.predict(corpus, loaded).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = ModelStore.predict(corpus, mem).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
    // the persisted df/N vocab relation round-trips the parquet exactly
    val w1 = ModelStore.vocabWithStats(fm.vocab, fm.counts, corpus)
      .orderBy("idx").collect().map(_.toSeq).toSeq
    val w2 = loaded.vocab.orderBy("idx").collect().map(_.toSeq).toSeq
    assert(w1 === w2)
  }

  test("m11 planted corpus predicts closed-form at sf0.001 (dataset-size robustness)") {
    // the harness oracle pins sf0.01; this pins a different corpus size,
    // so the well-separated-groups construction is not tuned to one SF
    val got = graft.ml.MlQueries.predictPlanted(spark, sfTiny)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    val ids = got.keySet
    val expect = ids.map(id => id -> ids.filter(_ % 5 == id % 5).min).toMap
    assert(got === expect)
  }

  test("m18: the pre-refit model still serves inside the rollback window") {
    import graft.api.ServePointer
    val out = graft.ml.MlQueries.modelForget(spark, sfTiny).collect()
    assert(out.length === 3)
    assert(out.forall(_.getLong(1) === 1L), "markers must be in the v1 vocab")
    assert(out.forall(_.getLong(2) === 0L), "markers must leave the refit vocab")
    val root = graft.sources.TmpDirs.artifactRoot(spark, sfTiny, "m18")
    val date = java.time.LocalDate.of(2026, 1, 1)
    val d1 = ModelStore.versionedDir(s"$root/model", 15, date)
    val d2 = ModelStore.versionedDir(s"$root/model", 15, date.plusDays(1))
    val ptr = s"$root/pointer"
    // the audit trail records exactly the rollout: v1 shipped, v2 refit
    assert(ServePointer.history(ptr).map(_._1) === Seq(1, 2))
    assert(ServePointer.current(ptr).get ===
      java.nio.file.Paths.get(d2).toAbsolutePath.normalize().toString)
    // v1 is inside the keepLast=2 rollback window (janitor must not
    // touch it) and leaves it only when the horizon shrinks past it
    assert(ServePointer.retirable(ptr, Seq(d1, d2), keepLast = 2).isEmpty)
    assert(ServePointer.retirable(ptr, Seq(d1, d2), keepLast = 1) === Seq(d1))
    // the pre-refit model still SERVES: load v1 from disk and predict
    // the m10 sample through the full vectorize→nearest-centroid path
    val v1 = ModelStore.load(spark, d1)
    assert(v1.vocab.filter(col("term") === "zzqalpha").count() === 1)
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text"))
    val sample = graft.sources.Sinks.sampleByMod(docs, "doc_id", 10, 3)
    assert(ModelStore.predict(sample, v1).count() > 0)
    // the adopted refit provably forgot the planted doc's vocabulary
    val cur = ModelStore.load(spark, ServePointer.current(ptr).get)
    assert(cur.vocab.filter(col("term").startsWith("zzq")).count() === 0)
  }

  test("predict drops OOV terms and zero-fills (dfm_match semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val fm = ModelPipeline.fit(corpus, k = 2, seed = 123, vocabSize = 100)
    ModelStore.save(dir, fm.model, fm.vocab, fm.counts, corpus)
    val saved = ModelStore.load(spark, dir)
    // unseen words vanish; known words still classify the doc
    val newDocs = Seq((99L, "quantum blockchain energy battery power"))
      .toDF("doc_id", "text")
    val vec = ModelStore.vectorize(newDocs, saved).collect()
    assert(vec.length === 1)
    val out = ModelStore.predict(newDocs, saved).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 99L)
  }
}
