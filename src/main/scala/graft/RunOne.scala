package graft

import org.apache.spark.sql.SparkSession

/** Run ONE registered query and dump its parquet — the single-query
  * iteration loop (Verify runs the whole registry; re-checking one
  * oracle against one SF should not cost a full sweep).
  * Usage: runMain graft.RunOne <query_name> <sfDir> <outDir>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    // default must MATCH Verify's, or a partitioning-dependent oracle
    // mismatch won't reproduce in the tool that exists to reproduce it
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach(sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}.sql"), sql))
    spark.stop()
  }
}
