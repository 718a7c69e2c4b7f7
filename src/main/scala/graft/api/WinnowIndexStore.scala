package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Winnowing-fingerprint index persistence — [[LshIndexStore]]'s store
  * discipline at SUBSTRING grain (r14 verdict item 5): a deployment
  * persists the corpus's pruned winnow-fingerprint relation (t08's
  * output under the fanout guard, applied once at build time) and
  * probes each incoming batch against the LOADED index — the MOSS
  * "check new submissions against the archive" posture. The artifact
  * is the (doc_id, fp) relation; candidate pairs verify exactly
  * downstream through the gram-hash join (d24's composition).
  *
  * 100 TB shape: the index is ~1/w of the corpus's gram stream and is
  * written/read as an ordinary parquet relation — at deployment
  * bucketed by `fp`, the probe access key, so a batch probe plans as a
  * co-located equi-join. The (k, w) winnow geometry is part of the
  * versioned path: an artifact is only probeable by the scheme that
  * built it. */
object WinnowIndexStore {

  /** S9 versioned path convention: f(gram size, window, date). */
  def versionedDir(base: String, k: Int, w: Int,
      date: java.time.LocalDate): String =
    s"$base/${k}g${w}w_winnow_index_$date"

  /** Persist a pruned (doc_id, fp) fingerprint index. */
  def save(dir: String, index: DataFrame): Unit =
    index.select(col("doc_id"), col("fp"))
      .write.mode("overwrite").parquet(dir)

  /** Load an index for probing. Loud on a missing/mis-shaped store —
    * probing half an index silently under-recalls. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.read.parquet(dir)
    val missing = Seq("doc_id", "fp").filterNot(idx.columns.contains)
    require(missing.isEmpty,
      s"winnow index store $dir is missing columns: ${missing.mkString(", ")}")
    idx.select(col("doc_id"), col("fp"))
  }

  // ----- Index MAINTENANCE (r15 verdict ask #2 — the one store that
  // missed the r15 sweep): an archive that cannot grow forces a full
  // corpus refingerprint per crawl, and one that cannot forget keeps
  // matching taken-down text into plagiarism-review queues. The
  // lifecycle is [[LshIndexStore]]'s verbatim: appends/tombstones
  // publish through ExportCommit's atomic manifest (exactly-once under
  // replayed batchIds), probes read base ∪ committed appends, and
  // compaction folds the union back into ONE versioned artifact with
  // the fanout census RE-RUN over it — the only stage that sees all
  // rows, so fps that grew degenerate ACROSS increments retire there
  // (per-batch appends can only census themselves; the serve-side
  // growth between folds is bounded by [[CompactionPolicy.due]]'s
  // cadence, as for the band store). -----

  /** Stage + atomically commit one append batch: the incoming
    * (doc_id, text) docs are fingerprinted by the SAME builder as
    * every index build
    * ([[graft.operators.DedupOps.prunedFingerprintIndex]] — shared
    * definition, the winnow selection cannot drift between build and
    * maintenance) and committed under `batchId`. */
  def appendBatch(root: String, docs: DataFrame, batchId: Long): Unit = {
    if (graft.sources.ExportCommit.isCommitted(root, batchId)) return
    val staged = graft.sources.ExportCommit.stage(root, batchId)
    graft.operators.DedupOps.prunedFingerprintIndex(docs)
      .write.parquet(staged)
    graft.sources.ExportCommit.commitBatch(root, batchId, staged)
    ()
  }

  /** Every committed appended (doc_id, fp) row. An empty manifest
    * reads as a typed empty relation. */
  def committedAppends(spark: SparkSession, root: String): DataFrame = {
    val dirs = graft.sources.ExportCommit.committedDirs(root)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("fp", LongType))))
    } else {
      val read = spark.read.parquet(dirs: _*)
      val missing = Seq("doc_id", "fp").filterNot(read.columns.contains)
      require(missing.isEmpty,
        s"winnow append store $root is missing columns: ${missing.mkString(", ")}")
      read.select(col("doc_id"), col("fp"))
    }
  }

  /** Stage + atomically commit one tombstone batch (a `doc_id`
    * column): a taken-down document's fingerprints must leave the
    * archive, or its content keeps matching future submissions.
    * Replay-safe. */
  def appendTombstones(root: String, ids: DataFrame, batchId: Long): Unit = {
    if (graft.sources.ExportCommit.isCommitted(root, batchId)) return
    val staged = graft.sources.ExportCommit.stage(root, batchId)
    ids.select(col("doc_id")).write.parquet(staged)
    graft.sources.ExportCommit.commitBatch(root, batchId, staged)
    ()
  }

  /** Every committed tombstoned doc id (distinct). Empty manifest ⇒
    * nothing deleted. */
  def committedTombstones(spark: SparkSession, root: String): DataFrame = {
    val dirs = graft.sources.ExportCommit.committedDirs(root)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType))))
    } else {
      val read = spark.read.parquet(dirs: _*)
      require(read.columns.contains("doc_id"),
        s"winnow tombstone store $root is missing the doc_id column")
      read.select(col("doc_id")).distinct()
    }
  }

  /** Fold base artifact + committed appends into ONE new versioned
    * artifact at `outDir`, re-running the global fanout census over
    * the union ([[graft.operators.DedupOps.pruneFingerprints]]). When
    * a `tombstoneRoot` is given, the committed delete log is folded
    * PHYSICALLY first — BEFORE the census (d25's ordering): retiring a
    * heavily-quoted doc can legitimately bring an over-cap fp back
    * under the fanout guard, and the census must see the post-delete
    * doc counts. After adoption, the append root's batch dirs and the
    * folded tombstone entries are janitor garbage. */
  def compactAppends(spark: SparkSession, baseDir: String,
      appendRoot: String, outDir: String,
      tombstoneRoot: Option[String] = None): Unit = {
    val folded = load(spark, baseDir)
      .unionByName(committedAppends(spark, appendRoot))
    val cleaned = tombstoneRoot.fold(folded)(t =>
      folded.join(committedTombstones(spark, t), Seq("doc_id"), "left_anti"))
    save(outDir, graft.operators.DedupOps.pruneFingerprints(cleaned))
  }
}
