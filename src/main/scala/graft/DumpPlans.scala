package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization round's before/after plan evidence
  * (`plans/r19/<query>_<tag>.txt`). Streaming rows return a drained
  * memory-sink table whose plan is a LocalTableScan; their real plans
  * are the per-drain streaming plans, which this tool cannot see —
  * batch rows are the meaningful targets. Not part of the driver
  * contract.
  *
  * Usage: run_main.sh graft.DumpPlans <name>[,<name>...] <tag> [outDir]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val tag = args(1)
    val outDir = args.lift(2).getOrElse("/root/repo/plans/r19")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
