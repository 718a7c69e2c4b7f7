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
    idx
  }
}
