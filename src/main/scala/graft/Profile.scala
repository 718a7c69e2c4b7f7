package graft

import org.apache.spark.sql.functions._

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val v = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      v
    }
    import graft.api.ModelPipeline
    import graft.refine.LdaSplitter
    val params = LdaSplitter.Params(kRange = 2 to 3, coherenceThreshold = 0.5,
      minDocsForSplit = 10, maxIter = 5)
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val fm = time("fit (featurize+kmeans)")(
        ModelPipeline.fit(graft.sources.Tables.documents(spark, d), 15, 123, 2000))
      val scores = time("coherence")(
        ModelPipeline.coherence(fm, params.topM).collect())
      val sc = scores.map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val countVecs = time("countVectors")(
        graft.features.Featurize.countVectors(fm.counts, fm.vocab, fm.vocabTerms.length))
      val updated = time("LdaSplitter.split")(
        LdaSplitter.split(fm.docTerms, countVecs,
          fm.assignments.select(col("doc_id"), col("cluster")), sc, fm.vocabTerms, params))
      val renum = time("renumber+join+checkpoint")(
        graft.refine.Renumber.dense(updated)
          .join(fm.assignments.select(col("doc_id"), col("features")), "doc_id")
          .localCheckpoint())
      val merged = time("merge")(ModelPipeline.merge(renum, 0.9))
      time("stats+show")(
        graft.refine.ModelRefresh.stats(merged).orderBy(col("cluster"))
          .write.mode("overwrite").format("noop").save())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
