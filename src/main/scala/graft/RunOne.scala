package graft

import org.apache.spark.sql.SparkSession

/** Run registered queries by name and dump their parquet — the
  * per-query iteration loop (Verify runs the whole registry;
  * re-checking a few oracles against one SF should not cost a full
  * sweep). Accepts a comma-separated name list so a family re-check
  * pays ONE JVM + session bring-up.
  * Usage: runMain graft.RunOne <name>[,<name>...] <sfDir> <outDir>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    // default must MATCH Verify's, or a partitioning-dependent oracle
    // mismatch won't reproduce in the tool that exists to reproduce it
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      SparkEntry.oracleSql.get(name).foreach(sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}.sql"), sql))
    }
    spark.stop()
  }
}
