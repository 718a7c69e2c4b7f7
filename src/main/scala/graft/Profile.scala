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
    def run(q: String): Long = {
      SparkEntry.queries(q)(spark, d).write.mode("overwrite").format("noop").save(); 1L
    }
    for (adv <- Seq("64m", "8m", "1m", "64m", "8m", "1m")) {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      time(s"t08 adv=$adv")(run("t08_winnow_fingerprints"))
      time(s"d02 adv=$adv")(run("d02_jaccard_pairs"))
      time(s"m01 adv=$adv")({
        graft.api.Intermediates.clear()
        run("m01_doc_term_counts")
      })
    }
    spark.stop()
  }
}
