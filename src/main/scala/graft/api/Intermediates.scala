package graft.api

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Materialized-intermediate cache: the engine's equivalent of a
  * warehouse's shared materialized views. The modeling query family all
  * derives from the same handful of expensive relations — the
  * tokenize→ngram→count DFM subtree, its TF-IDF weighting, and the
  * fitted K-means/LDA pipeline state. Recomputing those per query turns
  * a shared O(corpus) scan into O(corpus × #queries): at 100 TB the DFM
  * build is hours of cluster time, so any real deployment materializes
  * it once and fans the reports out from the materialization (the
  * reference does the same thing imperatively — one `dfm` object feeds
  * every downstream stage, ref 02_build_models.R:161-190).
  *
  * Keyed by (session identity, logical key): a key fully describes the
  * input (dataset dir) and every parameter of the build, so a hit is
  * semantically identical to a rebuild. Values are localCheckpoint'd
  * DataFrames (or driver-side fitted state holding them); their
  * checkpoint RDD ids are recorded as *pinned* so the harness's
  * between-query scratch cleanup (Bench/Verify) can release everything
  * EXCEPT the shared materializations — unpersisting a localCheckpoint
  * is data loss, not cache eviction (lineage is truncated).
  *
  * RDD-id tracking is a before/after snapshot of
  * `sparkContext.getPersistentRDDs` around the build. Builds may nest
  * (the fitted-pipeline build reads the cached counts relation), so
  * `memo` is plain check-then-put rather than `computeIfAbsent` (which
  * forbids reentrancy); a concurrent duplicate build wastes work but
  * stays correct, and over-pinning a build's internal scratch
  * checkpoints only defers their cleanup to session end.
  */
object Intermediates {

  private val cache = new ConcurrentHashMap[String, Any]()
  private val pinnedRdds = ConcurrentHashMap.newKeySet[String]()

  // Hit/miss telemetry (r17 verdict ask #5 — the r17 driver sweep's
  // m-family anomaly could not be adjudicated from the bench artifact
  // because memo behavior was invisible: a 12× m07 is a memo REBUILD
  // if misses spiked, environment pressure if they didn't). Monotonic
  // session counters; Bench diffs them per query into the artifact.
  private val hitCount = new java.util.concurrent.atomic.AtomicLong()
  private val missCount = new java.util.concurrent.atomic.AtomicLong()

  /** Cumulative (hits, misses) across the session — diff two snapshots
    * to attribute builds to a query. [[releaseAll]]/[[clear]] do NOT
    * reset these (they are counters, not state). */
  def stats(): (Long, Long) = (hitCount.get, missCount.get)

  private def pinKey(appId: String, rddId: Int): String = s"$appId|$rddId"

  /** Drop cache entries and pins that belong to another application id —
    * after a SparkContext restart in one JVM, RDD ids from the stopped
    * context must not alias fresh scratch (a stale bare-int pin would
    * make the cleanup sweep skip a brand-new checkpoint forever). */
  private[graft] def sweepStale(appId: String): Unit = {
    val prefix = appId + "|"
    cache.keySet.removeIf(k => !k.startsWith(prefix))
    pinnedRdds.removeIf(k => !k.startsWith(prefix))
  }

  /** Keyed by (context application id, session identity, logical key):
    * the applicationId prefix guarantees a NEW SparkContext (fresh RDD id
    * space, fresh executors) can never hit an entry whose DataFrames are
    * bound to a stopped context, even if a session identityHashCode is
    * recycled after GC. Stale-context pins only make the cleanup sweep
    * skip an id it would otherwise release — a bounded leak, never a
    * correctness hazard. */
  private def fullKey(spark: SparkSession, key: String): String =
    spark.sparkContext.applicationId + "|" +
      System.identityHashCode(spark).toString + "|" + key

  /** Memoize `build` under (session, key), pinning any RDDs it persists. */
  def memo[T](spark: SparkSession, key: String)(build: => T): T = {
    val appId = spark.sparkContext.applicationId
    sweepStale(appId)
    val k = fullKey(spark, key)
    val hit = cache.get(k)
    if (hit != null) { hitCount.incrementAndGet(); hit.asInstanceOf[T] }
    else {
      missCount.incrementAndGet()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val v = build
      spark.sparkContext.getPersistentRDDs.keySet
        .diff(before).foreach(id => pinnedRdds.add(pinKey(appId, id)))
      val prev = cache.putIfAbsent(k, v.asInstanceOf[AnyRef])
      if (prev != null) prev.asInstanceOf[T] else v
    }
  }

  /** Is this persistent RDD a pinned materialization of THIS application
    * (skip in scratch cleanup)? Pins are appId-namespaced: ids recorded
    * under a stopped context never shadow a fresh context's scratch. */
  def isPinned(spark: SparkSession, rddId: Int): Boolean =
    pinnedRdds.contains(pinKey(spark.sparkContext.applicationId, rddId))

  /** Drop every memoized entry and pin (test isolation; the data blocks
    * themselves are released by the caller's unpersist sweep). */
  def clear(): Unit = { cache.clear(); pinnedRdds.clear() }

  /** Release EVERY materialization — pinned and scratch — and forget the
    * memo entries that reference them. The harness calls this at
    * query-family boundaries: the registry is name-sorted, so once a
    * family's last query has run its materializations have no future
    * consumer, and keeping their localCheckpoint blocks resident only
    * squeezes later families' share of the unified memory pool (observed
    * in the r6 bench: the t-family, which pins nothing, ran 3-5x slower
    * at the end of the 107-query sweep than standalone — the accumulated
    * d/e/m/s-family checkpoints were the ballast). Callers must not hold
    * DataFrames obtained from [[memo]] across a release: their
    * checkpoint blocks are gone and the truncated lineage cannot
    * recompute them. A later memo of the same key simply rebuilds. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    clear()
  }
}
