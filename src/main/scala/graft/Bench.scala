package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

object Bench {

  /** One query's aggregated sweep stats: (name, median, min, max,
    * firstSuccessful, failedRuns, memoHits, memoMisses,
    * firstShuffleRead, firstShuffleWrite, steadyShuffleRead,
    * steadyShuffleWrite) — shuffle volumes in bytes. */
  private[graft] type QueryStats =
    (String, Double, Double, Double, Double, Int, Long, Long,
      Long, Long, Long, Long)

  /** Per-stage shuffle-volume tally (r18 verdict ask #5): the plan-shape
    * pins can't see a same-shape 10× shuffle-BYTES regression, and the
    * memo/footprint sections carry no bytes. Stage-completion metrics
    * accumulate here; Bench diffs the counters at query boundaries —
    * the artifact then carries per-query shuffle read/write volume,
    * diffable round over round. */
  private[graft] final class ShuffleTally
      extends org.apache.spark.scheduler.SparkListener {
    private val read = new java.util.concurrent.atomic.AtomicLong()
    private val write = new java.util.concurrent.atomic.AtomicLong()
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    def snapshot(): (Long, Long) = (read.get, write.get)
  }

  /** Assemble the artifact line (r17 verdict ask #5 — self-diagnosing:
    * the r17 driver sweep showed a 12× m-family blowup that could not
    * be adjudicated from the artifact because the memo hit/miss and
    * family-boundary footprints lived on stderr, which the driver's
    * stdout tail doesn't capture. The JSON now carries both: an
    * anomalous sweep names its own cause — memo rebuild vs environment
    * pressure). Pure function so the artifact schema is spec-testable
    * without running a sweep. */
  private[graft] def renderLine(
      results: Seq[QueryStats],
      footprints: Seq[(String, String, Map[String, Long])],
      runsPerQuery: Int, compiled: Long, cacheMax: Long,
      sfDir: String, shuffleEnvelopeBytes: Long = 1L << 30): String = {
    val failed = results.collect {
      case (k, v, _, _, _, _, _, _, _, _, _, _) if v < 0 => "\"" + k + "\"" }
    // intermittent crashes (some-but-not-all runs failed) must stay
    // distinguishable in the metric line even though a median exists
    val flaky = results
      .collect { case (k, v, _, _, _, nf, _, _, _, _, _, _)
          if v >= 0 && nf > 0 => "\"" + k + "\":" + nf }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v, _, _, _, _, _, _, _, _, _, _) =>
      "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val spread = results.map { case (k, _, lo, hi, _, _, _, _, _, _, _, _) =>
      "\"" + k + "\":[" + lo + "," + hi + "]" }.mkString("{", ",", "}")
    // memo deltas only where a query touched the memo at all — a
    // 213-query sweep's artifact stays readable, and an m-family run
    // whose miss count is nonzero on a LATER-than-first run is the
    // rebuild signature the r17 adjudication needed
    val memo = results
      .collect { case (k, _, _, _, _, _, h, m, _, _, _, _) if h + m > 0 =>
        s""""$k":{"hit":$h,"miss":$m}""" }
      .mkString("{", ",", "}")
    // shuffle volumes (r18 ask #5): [first-run read, first-run write,
    // steady-state read, steady-state write] in BYTES, only where a
    // query shuffled at all — first vs steady splits a shared build's
    // shuffle from the query's own, the round-over-round diff of the
    // steady columns is the same-shape-regression detector
    val shuffle = results
      .collect { case (k, _, _, _, _, _, _, _, fr, fw, sr, sw)
          if fr + fw + sr + sw > 0 => s""""$k":[$fr,$fw,$sr,$sw]""" }
      .mkString("{", ",", "}")
    // the in-run envelope canary: a steady-state run moving more than
    // the envelope through the shuffle is named HERE, not discovered as
    // an unexplained wall-clock regression two rounds later
    val over = results
      .collect { case (k, _, _, _, _, _, _, _, _, _, sr, sw)
          if sr + sw > shuffleEnvelopeBytes => s""""$k":${sr + sw}""" }
      .mkString("{", ",", "}")
    val shuffleCanary =
      s"""{"envelope_bytes":$shuffleEnvelopeBytes,"over":$over,""" +
        s""""ok":${over == "{}"}}"""
    val fps = footprints.map { case (fam, at, m) =>
      s"""{"family":"$fam","at":"$at",""" +
        m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
          .mkString(",") + "}"
    }.mkString("[", ",", "]")
    val total = results.collect {
      case (_, v, _, _, _, _, _, _, _, _, _, _) if v >= 0 => v }.sum
    val firstTotal = results.collect {
      case (_, v, _, _, f, _, _, _, _, _, _, _) if v >= 0 => f }.sum
    val cacheOk = compiled <= (cacheMax * 8) / 10
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""spread":$spread,"runs_per_query":$runsPerQuery,""" +
      s""""first_total":$firstTotal,"flaky":$flaky,""" +
      s""""failed":${failed.mkString("[", ",", "]")},""" +
      s""""memo":$memo,"shuffle":$shuffle,""" +
      s""""shuffle_canary":$shuffleCanary,"footprints":$fps,""" +
      s""""codegen_cache_canary":{"compiled_classes":$compiled,""" +
      s""""cache_max":$cacheMax,"ok":$cacheOk},"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Single-sample timings on the ML family were observed ±5× across
    // runs (dozens of tiny concurrent LDA jobs → scheduler-noise-bound
    // wall clock). N runs per query, report the MEDIAN: a re-run of the
    // bench then agrees per query instead of ghost-regressing on noise.
    val runsPerQuery = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS") match {
        case Some(v) => scala.util.Try(v.toInt).getOrElse {
          System.err.println(
            s"[bench] SPARK_GRAFT_BENCH_RUNS='$v' is not an int — using 3")
          3
        }
        case None => 3
      })
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warm-up: one tiny scan + noop write initializes the parquet
    // reader, file index, codegen compiler, and write path ONCE, so the
    // one-time bring-up cost isn't billed to whichever query happens to
    // run first (it's session overhead, not query work). Fatal errors
    // (OOM, linkage) must propagate — only expected setup noise is eaten.
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .write.mode("overwrite").format("noop").save()
    catch { case NonFatal(e) =>
      System.err.println(s"[bench] warm-up failed (continuing): $e")
    }
    // Corpus-drift canary (footer reads only): a regenerated corpus is
    // named loudly here as the root cause, not as N opaque per-query
    // -1.0s; the sweep still runs whatever the drift didn't break.
    graft.sources.SchemaCanary.warn(spark, sfDir)
    // Shared Intermediates builds (DFM, K-means fit, IVF index) are
    // deliberately billed to the first query that triggers them: they are
    // real pipeline work and must stay inside the benchmark total —
    // excluding them (pre-building before the loop) would understate the
    // engine's cost. With medians the build lands only in that query's
    // FIRST run, so the median reflects steady-state cost; the build is
    // still visible in that query's max and in `first_total` (the sum of
    // first-run times — the honest cold-start figure for the whole sweep).
    // Per-query medians are run-order-dependent for the m/f families;
    // neither total is.
    // noop sink forces full materialization of every output column
    // (count() would let Catalyst prune the expensive projections).
    // Failed queries record a -1.0 sentinel and a `failed` list — a crash
    // must be distinguishable from a fast query in the metric line.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    // Storage/heap footprint at family boundaries — the
    // instrumentation that localizes any future sweep-pollution
    // regression to the family that accumulated the state. Recorded
    // INTO the artifact (r17 ask #5), echoed to stderr for humans.
    val footprints = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Map[String, Long])]
    def recordFootprint(fam: String, at: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val rt = Runtime.getRuntime
      val m = Map(
        "cached_rdds" -> infos.length.toLong,
        "storage_mem_mb" -> infos.map(_.memSize).sum / 1048576,
        "storage_disk_mb" -> infos.map(_.diskSize).sum / 1048576,
        "heap_used_mb" -> (rt.totalMemory - rt.freeMemory) / 1048576)
      footprints += ((fam, at, m))
      System.err.println(s"[bench] family $fam $at: " +
        m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    // Family-boundary release (registry is name-sorted, so each
    // one-letter family runs contiguously): once a family's last query
    // has run, its pinned materializations (d/e-family component labels,
    // the m-family DFM + fitted models) and the streaming memory sinks
    // have no future consumer — but left resident they squeeze the later
    // families' share of the 8 GiB unified pool. r6 evidence: t04/t05/t09
    // (which pin nothing) ran 3-5x slower at the END of the 107-query
    // sweep than standalone, at zero source diff. Cost: a family whose
    // first query re-triggers a shared build re-bills that build to its
    // own first run (s09 rebuilds the fitted model the m-family had) —
    // more honest than inheriting a neighbor family's leftovers.
    def familyBoundary(prevFam: String, fam: String): Unit = {
      recordFootprint(prevFam, "done")
      graft.api.Intermediates.releaseAll(spark)
      graft.streaming.EventStreams.releaseSinks(spark)
      spark.catalog.clearCache()
      System.gc()
      recordFootprint(fam, "start")
    }
    // Diagnostic subset filter (A/B arms only — the driver leaves it
    // unset and sweeps everything): comma-separated name PREFIXES, a
    // query runs iff its name starts with one of them. Family-scoped
    // arms ("m", "s09,s20") isolate whether a regression reproduces
    // without the rest of the sweep's session pressure.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    // Shuffle-volume tally (r18 ask #5). Listener delivery is async, so
    // query-boundary snapshots drain the bus first; the drain helper
    // reaches the package-private LiveListenerBus reflectively (it is
    // public in bytecode) and degrades to a no-op if the internal moves
    // — worst case a trailing stage's bytes land on the neighboring
    // snapshot, which the order-of-magnitude canary tolerates.
    val shuffleTally = new ShuffleTally
    spark.sparkContext.addSparkListener(shuffleTally)
    val drainBus: () => Unit = {
      val attempt = scala.util.Try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        val m = bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .getOrElse(sys.error("no waitUntilEmpty"))
        () => { scala.util.Try(m.invoke(bus)); () }
      }
      attempt.getOrElse(() => ())
    }
    def shuffleSnapshot(): (Long, Long) = {
      drainBus()
      shuffleTally.snapshot()
    }
    val shuffleEnvelopeBytes =
      sys.env.get("SPARK_GRAFT_SHUFFLE_ENVELOPE_MB")
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .map(_ * 1048576L).getOrElse(1L << 30)
    var prevFam = ""
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      val fam = name.take(1)
      if (prevFam.nonEmpty && fam != prevFam) familyBoundary(prevFam, fam)
      prevFam = fam
      System.err.println(s"[bench] start $name ($runsPerQuery runs)")
      val (memoHits0, memoMisses0) = graft.api.Intermediates.stats()
      val (shr0, shw0) = shuffleSnapshot()
      var firstBoundary = (shr0, shw0) // re-snapshotted after run 1
      val runs = (1 to runsPerQuery).map { i =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case NonFatal(e) =>
            System.err.println(s"[bench] $name run $i failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9 // before cleanup — its cost must not bill to this query
        if (i == 1) firstBoundary = shuffleSnapshot()
        // Release the query's SCRATCH state before the next run:
        // localCheckpoint blocks stay pinned until their RDD is GC'd, and
        // two dozen accumulated checkpoints visibly degrade the later
        // heavy queries in a shared session. Intermediates-pinned RDDs are
        // the session-shared materializations (DFM, fitted models) — they
        // are deliberately kept (unpersisting a localCheckpoint is data
        // loss, and later queries/runs reuse them by design).
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => graft.api.Intermediates.isPinned(spark, id) }
          .values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        if (ok) elapsed else -1.0
      }
      val good = runs.filter(_ >= 0)
      System.err.println(f"[bench] $name runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      val (memoHits1, memoMisses1) = graft.api.Intermediates.stats()
      val (shr1, shw1) = shuffleSnapshot()
      // first run = shared-build + query shuffle; steady = the per-run
      // average over the remaining runs (they are plan-identical, the
      // average smooths listener-drain attribution skew)
      val (fbr, fbw) = firstBoundary
      val (firstR, firstW) = (fbr - shr0, fbw - shw0)
      val (steadyR, steadyW) =
        if (runsPerQuery > 1)
          ((shr1 - fbr) / (runsPerQuery - 1), (shw1 - fbw) / (runsPerQuery - 1))
        else (firstR, firstW)
      // first-run slot uses the first SUCCESSFUL run: runs.head is the
      // -1.0 sentinel when only the first run failed, which would
      // silently corrupt first_total while the v>=0 guard passes
      (name,
        if (good.isEmpty) -1.0 else median(good),
        if (good.isEmpty) -1.0 else good.min,
        if (good.isEmpty) -1.0 else good.max,
        if (good.isEmpty) -1.0 else good.head,
        runs.count(_ < 0),
        memoHits1 - memoHits0,
        memoMisses1 - memoMisses0,
        firstR, firstW, steadyR, steadyW)
    }
    if (prevFam.nonEmpty) recordFootprint(prevFam, "done")
    // Registry-growth canary for the whole-stage-codegen class cache
    // (r13 verdict ask #5 — the r12 regression was silent for a full
    // round because nothing watched this): the sweep's total compile
    // count is the session's distinct-plan working set when the cache
    // holds (every plan compiles once); a working set past the cache
    // capacity recompiles on every run and the count balloons past it.
    // Guard at 80% capacity so the registry outgrowing the cache is
    // named BEFORE eviction churn starts skewing family timings.
    val compiled = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    val cacheMax = scala.util.Try(
      spark.conf.get("spark.sql.codegen.cache.maxEntries").toLong)
      .getOrElse(100L)
    val cacheOk = compiled <= (cacheMax * 8) / 10
    if (!cacheOk)
      System.err.println(
        s"[bench] CODEGEN CACHE CANARY FAILED: $compiled generated classes " +
          s"compiled this session vs spark.sql.codegen.cache.maxEntries=" +
          s"$cacheMax — the registry's distinct-plan working set is within " +
          "20% of (or past) the cache capacity; raise maxEntries in " +
          "Sessions.configure or late-sweep families will recompile every " +
          "plan every run (the r12 m-family regression, SCALE.md postmortem)")
    val shuffleMax = results.map { case (_, _, _, _, _, _, _, _, _, _, sr, sw)
      => sr + sw }.maxOption.getOrElse(0L)
    System.err.println(s"[bench] max steady-state shuffle volume " +
      s"${shuffleMax / 1048576} MB vs envelope " +
      s"${shuffleEnvelopeBytes / 1048576} MB")
    results.foreach { case (k, _, _, _, _, _, _, _, _, _, sr, sw) =>
      if (sr + sw > shuffleEnvelopeBytes)
        System.err.println(s"[bench] SHUFFLE ENVELOPE CANARY: $k moved " +
          s"${(sr + sw) / 1048576} MB through the shuffle at steady state " +
          s"— past the ${shuffleEnvelopeBytes / 1048576} MB envelope; a " +
          "same-shape plan moving 10x the bytes is a regression the plan " +
          "pins cannot see (check the round-over-round 'shuffle' diff)")
    }
    val line = renderLine(results, footprints.toSeq, runsPerQuery,
      compiled, cacheMax, sfDir, shuffleEnvelopeBytes)
    // Truncation-proofing: both prior rounds' driver artifacts captured
    // only a tail of stdout and cut the medians dict. The file is the
    // authoritative copy; the stdout line stays for the driver's parser.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    catch { case NonFatal(e) =>
      System.err.println(s"[bench] bench_out.json write failed: $e")
    }
    println(line)
    spark.stop()
  }
}
