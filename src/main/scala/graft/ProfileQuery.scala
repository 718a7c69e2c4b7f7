package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): run one or more
  * registered queries through the bench's own noop-sink methodology and
  * attribute wall-clock to the Spark JOBS inside each run — job
  * description (callsite), duration, task count, shuffle bytes. The
  * bench's per-query medians say WHICH query is slow; this says WHY
  * (which action inside it: a fit iteration, a store write, a drain, a
  * collect). Not part of the driver contract.
  *
  * Usage: run_main.sh graft.ProfileQuery <name>[,<name>...] [runs]
  */
object ProfileQuery {
  private final class JobTally extends SparkListener {
    final case class St(name: String, var ms: Long = 0L, var n: Int = 0,
        var tasks: Int = 0, var shuffleRead: Long = 0L,
        var shuffleWrite: Long = 0L)
    val stages = mutable.LinkedHashMap.empty[String, St]
    var jobs = 0
    var jobMs = 0L
    val jobStart = mutable.HashMap.empty[Int, Long]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      jobs += 1; jobStart(e.jobId) = e.time
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobStart.remove(e.jobId).foreach(t0 => jobMs += (e.time - t0).max(0L))
    }
    override def onStageCompleted(
        e: SparkListenerStageCompleted): Unit = synchronized {
      val i = e.stageInfo
      val key = i.name.takeWhile(_ != '+').trim // "op at File.scala:123"
      val st = stages.getOrElseUpdate(key, St(key))
      st.n += 1
      st.tasks += i.numTasks
      st.ms += (for (a <- i.completionTime; b <- i.submissionTime)
        yield (a - b).max(0L)).getOrElse(0L)
      val m = i.taskMetrics
      if (m != null) {
        st.shuffleRead += m.shuffleReadMetrics.totalBytesRead
        st.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = synchronized {
      stages.clear(); jobStart.clear(); jobs = 0; jobMs = 0L
    }
    def report(): String = synchronized {
      val sb = new StringBuilder
      sb.append(f"  jobs=$jobs jobTimeSum=${jobMs / 1e3}%.2fs " +
        f"stageTimeSum=${stages.values.map(_.ms).sum / 1e3}%.2fs\n")
      stages.values.toSeq.sortBy(-_.ms).take(40).foreach { s =>
        sb.append(f"  ${s.ms / 1e3}%7.2fs  n=${s.n}%-4d tasks=${s.tasks}%-5d " +
          f"shR=${s.shuffleRead / 1024}%-8d shW=${s.shuffleWrite / 1024}%-8d " +
          s"${s.name.take(110)}\n")
      }
      sb.toString
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .write.mode("overwrite").format("noop").save()
    catch { case scala.util.control.NonFatal(_) => }
    val tally = new JobTally
    spark.sparkContext.addSparkListener(tally)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        tally.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val el = (System.nanoTime() - t0) / 1e9
        // mirror Bench's inter-run cleanup so steady-state runs match
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) =>
            graft.api.Intermediates.isPinned(spark, id) }
          .values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        Thread.sleep(200) // let listener events drain
        println(f"== $name run $i: $el%.2fs")
        println(tally.report())
      }
    }
    spark.stop()
  }
}
