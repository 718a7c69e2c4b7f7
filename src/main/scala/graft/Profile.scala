package graft

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val m04 = graft.ml.MlQueries.clusterTopTerms(spark, d)
    time("m04 first")(m04.count())
    println(m04.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Window"))
      .mkString("\n"))
    time("m04 second")(graft.ml.MlQueries.clusterTopTerms(spark, d).count())
    time("m05")(graft.ml.MlQueries.coherenceReport(spark, d).count())
    spark.stop()
  }
}
