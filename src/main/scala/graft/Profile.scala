package graft

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = Seq("f02_label_prompts", "f03_doc_labels",
      "m01_doc_term_counts", "m02_tfidf_quanteda", "m03_top_vocab",
      "m04_cluster_top_terms", "m05_coherence_report", "m06_kmeans_stats",
      "m07_lda_optimize", "m08_cluster_merge", "m09_refiner_report",
      "t08_winnow_fingerprints")
    val qs = SparkEntry.queries
    var total = 0.0
    names.foreach { name =>
      val t0 = System.nanoTime()
      qs(name)(spark, d).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      total += dt
      println(f"$name%-28s $dt%8.2f s")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => graft.api.Intermediates.isPinned(id) }
        .values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    println(f"TOTAL ${total}%.2f s")
    spark.stop()
  }
}
