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
}
