package graft

import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

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
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        array_distinct(TextFunctions.ngrams(TextFunctions.tokens(col("text")), 3)).as("toks"))
      .filter(size(col("toks")) > 0)
    time("shingle")(docs.count())
    time("shingle again")(docs.count())
    val sh = docs.select(col("doc_id"), explode(col("toks")).as("shingle"))
    time("explode")(sh.count())
    val aggs = (0 until 32).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val sig = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until 32).map(i => col(s"h$i")): _*).as("sig"))
    time("signatures")(sig.count())
    val banded = sig.select(col("doc_id"), posexplode(
      array((0 until 8).map(b => xxhash64(slice(col("sig"), b * 4 + 1, 4))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded")(banded.count())
    val smallBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).filter(col("n").between(2, 50))
      .select(col("band"), col("bucket"))
    time("smallBuckets")(smallBuckets.count())
    val pruned = banded.join(smallBuckets, Seq("band", "bucket"))
    time("pruned")(pruned.count())
    val pairs = pruned.as("a").join(pruned.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    time("pairs")(pairs.count())
    spark.stop()
  }
}
