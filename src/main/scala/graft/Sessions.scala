package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for the engine's entry points
  * (Verify, Bench, tests). Local-mode sized, but every knob is the one
  * you'd set on a real cluster too.
  */
object Sessions {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      // planner extension: interpreted aggregate(zip_with(...)) vector
      // math rewrites to the codegen'd ArrayDot kernel
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark reads it as
      // nano-epoch longs under this flag (Tables.events converts).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = configure(
      SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
