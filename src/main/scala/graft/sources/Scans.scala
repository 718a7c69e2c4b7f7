package graft.sources

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

/** Scan-side partitioning helpers. */
object Scans {

  /** True when the plan is a pure project/filter chain over one leaf
    * relation — the only shape widening applies to. Anything with an
    * upstream join/agg/shuffle already sized its own parallelism, and
    * re-shuffling it here would add an exchange for nothing. */
  private def scanOnly(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case pr: Project => scanOnly(pr.child)
    case f: Filter   => scanOnly(f.child)
    case _           => false
  }

  /** Widen a narrow scan before a high-fanout per-row stage (explode of
    * n-grams/char-grams, per-token hashing): a small parquet table is
    * often ONE row group → ONE input partition, so everything before the
    * first exchange runs single-threaded regardless of cluster width.
    * Repartitioning by the downstream key parallelizes the fanout stage
    * and (when the key matches) satisfies the next operator's required
    * distribution, so no second exchange appears.
    *
    * The decision is METADATA-ONLY: split count is estimated from the
    * optimized plan's size statistics (file-index bytes / split size),
    * never from `df.rdd` — under AQE, `.rdd` materializes every upstream
    * query stage just to count partitions, turning lazy plan
    * construction into eager double execution. Non-scan plans are left
    * untouched for the same reason.
    *
    * Conditional on the estimated scan width: at 100 TB the scan already
    * has thousands of splits and an extra shuffle of raw input would be
    * pure overhead — the helper is a no-op whenever the source is at
    * least half as wide as the cluster. The target width floors
    * `defaultParallelism` at the configured shuffle partitions:
    * under dynamic allocation, the executors registered at
    * plan-construction time can be a handful, and pinning the fanout
    * stage to that instant would invert the optimization on exactly the
    * large clusters it exists for. The count must be EXPLICIT either
    * way: `repartition(col)` alone lets AQE coalesce the tiny
    * pre-fanout bytes back to one partition, silently undoing the
    * widening (the fanout multiplies data volume AFTER this exchange,
    * which AQE cannot see). */
  def widenForFanout(df: DataFrame, key: Column): DataFrame = {
    // a STREAMING relation cannot be widened here (inspecting its
    // optimized plan is illegal pre-start, and micro-batch sources
    // parallelize at the source); the batch-only widening is a no-op
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val plan = df.queryExecution.optimizedPlan
    if (!scanOnly(plan)) return df
    val width = math.max(
      spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val splitBytes = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val estSplits = plan.stats.sizeInBytes / BigInt(math.max(1L, splitBytes)) + 1
    if (estSplits * 2 < width) df.repartition(width, key) else df
  }
}
