package graft.refine

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-reassignment model refresh (SURVEY §2.9 M6): recompute centers,
  * sizes, and within-cluster SSQ after a split or merge mutated the
  * assignments (ref update_kmeans_model 02_build_models.R:391-450;
  * 04_cluster_refiner.R:249-285). Immutable recompute instead of the
  * reference's in-place model surgery: centers via a distributed
  * Summarizer mean, stats via one shuffle keyed on cluster id.
  */
object ModelRefresh {

  /** (cluster, center) — distributed mean per cluster (A3). */
  def centers(assignments: DataFrame): DataFrame =
    assignments.groupBy(col("cluster"))
      .agg(Summarizer.mean(col("features")).as("center"))

  /** (cluster, n_docs, withinss) against freshly recomputed centers
    * (A4 + A5). Centers are k rows — broadcast to the sqdist side. */
  def stats(assignments: DataFrame): DataFrame = {
    val sq = udf { (v: Vector, c: Vector) => Vectors.sqdist(v, c) }
    assignments
      .join(broadcast(centers(assignments)), "cluster")
      .withColumn("sq", sq(col("features"), col("center")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"), round(sum(col("sq")), 4).as("withinss"))
  }
}
