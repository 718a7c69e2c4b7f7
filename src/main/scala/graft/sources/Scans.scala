package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-side partitioning helpers. */
object Scans {

  /** Widen a narrow scan before a high-fanout per-row stage (explode of
    * n-grams/char-grams, per-token hashing): a small parquet table is
    * often ONE row group → ONE input partition, so everything before the
    * first exchange runs single-threaded regardless of cluster width.
    * Repartitioning by the downstream key parallelizes the fanout stage
    * and (when the key matches) satisfies the next operator's required
    * distribution, so no second exchange appears.
    *
    * Conditional on the actual scan width: at 100 TB the scan already
    * has thousands of splits and an extra shuffle of raw input would be
    * pure overhead — the helper is a no-op whenever the source is at
    * least half as wide as the cluster. */
  def widenForFanout(df: DataFrame, key: Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // the partition count must be EXPLICIT: repartition(col) alone lets
    // AQE coalesce the tiny pre-fanout bytes back to one partition,
    // silently undoing the widening (the fanout multiplies data volume
    // AFTER this exchange, which AQE cannot see)
    if (df.rdd.getNumPartitions * 2 < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism, key)
    else df
  }
}
