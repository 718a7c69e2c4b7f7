package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warm-up: one tiny scan + noop write initializes the parquet
    // reader, file index, codegen compiler, and write path ONCE, so the
    // one-time bring-up cost isn't billed to whichever query happens to
    // run first (it's session overhead, not query work).
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    // Shared Intermediates builds (DFM, K-means fit, IVF index) are
    // deliberately billed to the first query that triggers them: they are
    // real pipeline work and must stay inside the benchmark total —
    // excluding them (pre-building before the loop) would understate the
    // engine's cost. Per-query numbers are therefore run-order-dependent
    // for the m/f families; the total is not.
    // noop sink forces full materialization of every output column
    // (count() would let Catalyst prune the expensive projections).
    // Failed queries record a -1.0 sentinel and a `failed` list — a crash
    // must be distinguishable from a fast query in the metric line.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.err.println(s"[bench] start $name")
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9 // before cleanup — its cost must not bill to this query
      // Release the query's SCRATCH state before the next one runs:
      // localCheckpoint blocks stay pinned until their RDD is GC'd, and
      // two dozen accumulated checkpoints visibly degrade the later
      // heavy queries in a shared session. Intermediates-pinned RDDs are
      // the session-shared materializations (DFM, fitted models) — they
      // are deliberately kept (unpersisting a localCheckpoint is data
      // loss, and later queries reuse them by design).
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => graft.api.Intermediates.isPinned(id) }
        .values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      name -> (if (ok) elapsed else -1.0)
    }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
