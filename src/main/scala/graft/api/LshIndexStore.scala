package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** LSH band-index persistence — the [[IvfStore]] discipline for the
  * MinHash side (r13, completing the stored-index symmetry): d11
  * probes incoming batches against the corpus's band index, and a
  * deployment PERSISTS that index between crawl increments rather
  * than rebuilding it from the full corpus each time. The artifact is
  * the pruned (doc_id, band, bucket) relation — degenerate
  * boilerplate buckets are excluded at build/maintenance time, which
  * is part of what the artifact IS (the probe-side contract: every
  * stored bucket is probeable without quadratic fanout).
  *
  * 100 TB shape: the index is corpus-sized and is written/read as an
  * ordinary parquet relation — at deployment partitioned/bucketed by
  * (band, bucket), the probe access key, so a batch probe plans as a
  * co-located equi-join. The signature scheme (hash count, band
  * geometry) is part of the engine's versioned code; an artifact is
  * only probeable by the scheme that built it, which the versioned
  * path records.
  */
object LshIndexStore {

  /** S9 versioned path convention, mirroring [[ModelStore.versionedDir]]:
    * f(band count, date), date explicit for deterministic paths. */
  def versionedDir(base: String, bands: Int, date: java.time.LocalDate): String =
    s"$base/${bands}_band_lsh_index_$date"

  /** Persist a pruned (doc_id, band, bucket) band index. */
  def save(dir: String, index: DataFrame): Unit =
    index.select(col("doc_id"), col("band"), col("bucket"))
      .write.mode("overwrite").parquet(dir)

  /** Load an index for probing. Loud on a missing/mis-shaped store —
    * probing half an index silently under-recalls. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.read.parquet(dir)
    val missing = Seq("doc_id", "band", "bucket")
      .filterNot(idx.columns.contains)
    require(missing.isEmpty,
      s"lsh index store $dir is missing columns: ${missing.mkString(", ")}")
    idx.select(col("doc_id"), col("band"), col("bucket"))
  }

  // ----- Index MAINTENANCE (r14 verdict ask #4 — [[IvfStore]]'s
  // append/compact lifecycle for the MinHash side): a crawl increment's
  // band rows are staged and published through ExportCommit's atomic
  // manifest (exactly-once under replayed batchIds), probes read base ∪
  // committed appends, and compaction periodically folds the manifest
  // union back into ONE versioned artifact with the bucket census
  // RE-RUN over the union — the only stage that sees all rows, so
  // buckets that grew degenerate ACROSS increments retire there
  // (per-batch appends can only census themselves). -----

  /** Stage + atomically commit one append batch: the incoming
    * (doc_id, text) docs are banded by the SAME builder as every index
    * build ([[graft.operators.DedupOps.prunedBandIndex]] — shared
    * definition, the band math cannot drift between build and
    * maintenance) and committed under `batchId`.
    *
    * Compaction-cadence bound (r15 ADVICE): the per-batch census can
    * only see its own batch, so a bucket that grows degenerate ONLY
    * across increments keeps matching probes until the next
    * [[compactAppends]] re-census — between compactions, serve-side
    * bucket growth is bounded by (committed batches × per-batch cap).
    * Deployments must not defer compaction indefinitely:
    * [[CompactionPolicy.due]] is the janitor predicate that bounds the
    * manifest length (and with it the worst-case probe fanout). */
  def appendBatch(root: String, docs: DataFrame, batchId: Long): Unit = {
    if (graft.sources.ExportCommit.isCommitted(root, batchId)) return
    val staged = graft.sources.ExportCommit.stage(root, batchId)
    graft.operators.DedupOps.prunedBandIndex(docs).write.parquet(staged)
    graft.sources.ExportCommit.commitBatch(root, batchId, staged)
    ()
  }

  /** Every committed appended band row. An empty manifest reads as a
    * typed empty relation. */
  def committedAppends(spark: SparkSession, root: String): DataFrame = {
    val dirs = graft.sources.ExportCommit.committedDirs(root)
    if (dirs.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("band", IntegerType),
          StructField("bucket", LongType))))
    } else {
      val read = spark.read.parquet(dirs: _*)
      val missing = Seq("doc_id", "band", "bucket")
        .filterNot(read.columns.contains)
      require(missing.isEmpty,
        s"lsh append store $root is missing columns: ${missing.mkString(", ")}")
      read.select(col("doc_id"), col("band"), col("bucket"))
    }
  }

  /** Stage + atomically commit one tombstone batch (a `doc_id` column)
    * — [[IvfStore.appendTombstones]]'s posture for the LSH artifact: a
    * taken-down document's band rows must leave the index (its content
    * would otherwise keep matching future probes and resurface the
    * deleted text through dedup REVIEW queues). Replay-safe. */
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
        s"lsh tombstone store $root is missing the doc_id column")
      read.select(col("doc_id")).distinct()
    }
  }

  /** Fold base artifact + committed appends into ONE new versioned
    * artifact at `outDir`, re-running the global bucket census over the
    * union ([[graft.operators.DedupOps.pruneBands]]). When a
    * `tombstoneRoot` is given, the committed delete log is folded
    * PHYSICALLY first: a tombstoned doc's band rows leave the artifact
    * (ids-sized anti-join) BEFORE the census, so retiring a
    * duplicate-heavy document can legitimately resurrect a bucket its
    * mass had pushed past the cap. After adoption, the append root's
    * batch dirs and the folded tombstone entries are janitor garbage. */
  def compactAppends(spark: SparkSession, baseDir: String,
      appendRoot: String, outDir: String,
      tombstoneRoot: Option[String] = None): Unit = {
    val folded = load(spark, baseDir)
      .unionByName(committedAppends(spark, appendRoot))
    val cleaned = tombstoneRoot.fold(folded)(t =>
      folded.join(committedTombstones(spark, t), Seq("doc_id"), "left_anti"))
    save(outDir, graft.operators.DedupOps.pruneBands(cleaned))
  }
}
