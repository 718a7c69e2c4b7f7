package graft

import graft.operators.{EmbeddingOps, SkewOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Salted rewrites must be semantics-preserving, and the IVF probe path
  * must find what brute force finds (for the probed neighborhood). */
class SkewOpsSpec extends SparkSpec {

  test("salted two-phase aggregation equals the plain aggregation") {
    val events = Tables.events(spark, sfTiny)
    val salted = SkewOps.saltedCountSum(events,
        col("event_type"), col("value"), col("event_id"), saltFactor = 8)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    val plain = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("vsum"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    assert(salted === plain)
  }

  test("salted join equals the plain join row-for-row") {
    val events = Tables.events(spark, sfTiny)
    val dim = events.groupBy(col("user_id")).agg(count(lit(1)).as("user_events"))
    val salted = SkewOps.saltedJoin(events, dim, "user_id",
        col("event_id"), saltFactor = 8)
      .select("event_id", "user_id", "user_events")
      .collect().map(_.toSeq).toSet
    val plain = events.join(dim, "user_id")
      .select("event_id", "user_id", "user_events")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("IVF ANN recalls planted near-neighbors (structured fixture)") {
    import spark.implicits._
    // 8 well-separated direction clusters × 25 members; query = vec 0 in
    // cluster 0 with a planted 0.99-cosine twin (vec 1). The corpus
    // embeddings are isotropic noise where "nearest" is meaningless —
    // THIS is the workload IVF exists for (near-dup detection).
    val rnd = new scala.util.Random(7)
    val dim = 32
    val base = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 200).map { i =>
      // vec 1 is the planted near-twin of vec 0: same base direction
      // (cluster 0), tiny jitter
      val c = if (i == 1) 0 else i % 8
      val jitter = if (i == 1) 0.02f else 0.4f
      val v = base(c).map(x => x + jitter * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val got = EmbeddingOps.ivfTopK(emb, queryId = 0, k = 20,
        cells = EmbeddingOps.IvfCells, probes = EmbeddingOps.IvfProbes)
      .collect().map(_.getLong(0))
    assert(got.head === 1L, s"planted twin not top-1: ${got.take(5).toSeq}")
    // most of the query's own cluster should surface in the top-20
    val sameCluster = got.count(i => i % 8 === 0 || i === 1L)
    assert(sameCluster >= 15, s"cluster recall too low: $sameCluster/20")
  }
}
