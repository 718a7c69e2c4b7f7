package graft

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val qs = SparkEntry.queries
    for (name <- Seq("q01_pricing_summary", "q02_revenue_by_nation",
        "q15_events_hourly", "m03_top_vocab", "e02_similar_pairs")) {
      val plan = qs(name)(spark, d).queryExecution.executedPlan.toString
      println(s"########## $name")
      println(plan.linesIterator.filter(l =>
        l.contains("Scan") || l.contains("Join") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("TakeOrdered") ||
          l.contains("Cartesian") || l.contains("Exchange"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
