package graft

/** Scratch profiler for operator stages (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("m06_kmeans")(graft.ml.MlQueries.kmeansStats(spark, d).count())
    time("m07_lda_optimize")(graft.ml.MlQueries.ldaOptimize(spark, d).count())
    time("m08_cluster_merge")(graft.ml.MlQueries.clusterMerge(spark, d).count())
    time("m03_top_vocab")(graft.ml.MlQueries.topVocab(spark, d).count())
    time("m05_coherence")(graft.ml.MlQueries.coherenceReport(spark, d).count())
    spark.stop()
  }
}
