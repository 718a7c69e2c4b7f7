package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Passage-hash index persistence — the [[LshIndexStore]] store
  * discipline at PASSAGE grain (r15 verdict ask #1, the last
  * incremental grain whose index was rebuilt from the full corpus per
  * probe): d17 asks "how much of this incoming document is already in
  * my corpus" by joining batch passages against the corpus's
  * passage-hash membership set, and a deployment PERSISTS that set
  * between crawl increments. The artifact is the (doc_id, h) relation
  * — one row per distinct (document, 128-bit passage hash). Carrying
  * doc_id is what makes the artifact deletable: a takedown anti-joins
  * the id out, and a passage whose only holder is tombstoned leaves
  * the membership set while one also held by a survivor stays. The
  * probe reads the DISTINCT hash set (membership semantics — see
  * [[graft.operators.DedupOps]]'s shared probe).
  *
  * Unlike the banded/fingerprint stores there is NO census here:
  * passage-hash membership has no quadratic fanout (the probe is an
  * aggregate roll-up, not a pair join), so append and compaction are
  * pure set maintenance — union, anti-join, rewrite.
  *
  * 100 TB shape: the index is corpus-sized and is written/read as an
  * ordinary parquet relation — at deployment bucketed by `h`, the
  * probe access key, so a batch probe plans as a co-located equi-join.
  * The passage geometry (token width) is part of the versioned path:
  * an artifact is only probeable by the slicing that built it. */
object PassageIndexStore {

  /** S9 versioned path convention: f(passage token width, date). */
  def versionedDir(base: String, tokens: Int,
      date: java.time.LocalDate): String =
    s"$base/${tokens}t_passage_index_$date"

  /** Persist a (doc_id, h) passage-hash index. */
  def save(dir: String, index: DataFrame): Unit =
    index.select(col("doc_id"), col("h"))
      .write.mode("overwrite").parquet(dir)

  /** Load an index for probing. Loud on a missing/mis-shaped store —
    * probing half an index silently under-counts known content. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.read.parquet(dir)
    val missing = Seq("doc_id", "h").filterNot(idx.columns.contains)
    require(missing.isEmpty,
      s"passage index store $dir is missing columns: ${missing.mkString(", ")}")
    idx.select(col("doc_id"), col("h"))
  }

  /** Stage + atomically commit one append batch: the incoming
    * (doc_id, text) docs are sliced and hashed by the SAME builder as
    * every index build ([[graft.operators.DedupOps.passageHashIndex]]
    * — shared definition, the passage slicing cannot drift between
    * build and maintenance) and committed under `batchId`. Replay-safe
    * via the manifest CAS plus the pre-staging fast path. */
  def appendBatch(root: String, docs: DataFrame, batchId: Long): Unit = {
    if (graft.sources.ExportCommit.isCommitted(root, batchId)) return
    val staged = graft.sources.ExportCommit.stage(root, batchId)
    graft.operators.DedupOps.passageHashIndex(docs).write.parquet(staged)
    graft.sources.ExportCommit.commitBatch(root, batchId, staged)
    ()
  }

  /** Every committed appended (doc_id, h) row. An empty manifest reads
    * as a typed empty relation. */
  def committedAppends(spark: SparkSession, root: String): DataFrame = {
    val dirs = graft.sources.ExportCommit.committedDirs(root)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("h", StringType))))
    } else {
      val read = spark.read.parquet(dirs: _*)
      val missing = Seq("doc_id", "h").filterNot(read.columns.contains)
      require(missing.isEmpty,
        s"passage append store $root is missing columns: ${missing.mkString(", ")}")
      read.select(col("doc_id"), col("h"))
    }
  }

  /** Stage + atomically commit one tombstone batch (a `doc_id` column)
    * — a taken-down document's passages must leave the membership set,
    * or its content keeps reporting as "already known" and suppresses
    * legitimate re-ingestion. Replay-safe. */
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
        s"passage tombstone store $root is missing the doc_id column")
      read.select(col("doc_id")).distinct()
    }
  }

  /** Fold base artifact + committed appends into ONE new versioned
    * artifact at `outDir`. When a `tombstoneRoot` is given, the
    * committed delete log is folded PHYSICALLY: a tombstoned doc's
    * rows leave the artifact (ids-sized anti-join) — a passage it
    * alone held leaves the membership set; one a survivor also holds
    * stays, through the survivor's own row. The distinct() guards the
    * per-(doc, hash) contract when the same doc arrives in more than
    * one batch (a re-crawled doc appended twice must not double its
    * rows). After adoption, the append root's batch dirs and the
    * folded tombstone entries are janitor garbage
    * ([[graft.sources.ExportCommit.gcStaging]]); WHEN to fold is
    * [[CompactionPolicy.due]]'s call. */
  def compactAppends(spark: SparkSession, baseDir: String,
      appendRoot: String, outDir: String,
      tombstoneRoot: Option[String] = None): Unit = {
    val folded = load(spark, baseDir)
      .unionByName(committedAppends(spark, appendRoot))
      .distinct()
    val cleaned = tombstoneRoot.fold(folded)(t =>
      folded.join(committedTombstones(spark, t), Seq("doc_id"), "left_anti"))
    save(outDir, cleaned)
  }
}
