package graft

import graft.operators.{GraphOps, PackOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exclusivePrefixSum matches the single-partition window reference") {
    // deliberately unsorted input with enough rows to span partitions
    val data = (1L to 500L).map(i => ((i * 7919) % 1000, i % 13))
    val df = spark.sparkContext.parallelize(data, 8).toDF("k", "v")
    val got = PackOps.exclusivePrefixSum(df, Seq("k"), col("v"), "cum")
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("grouped exclusivePrefixSum restarts per stratum") {
    val data = (1L to 300L).map(i => (i, s"s${i % 3}", 1L))
    val df = spark.sparkContext.parallelize(data, 7).toDF("k", "g", "v")
    val got = PackOps.exclusivePrefixSum(df, Seq("k"), col("v"), "cum",
        strata = Seq("g"))
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("p01 packs contiguous spans: offsets in range and bins in order") {
    val df = PackOps.sequencePack(spark, sfTiny)
      .select(col("doc_id"), col("n_tokens"), col("seq_id"), col("tok_offset"))
      .as[(Long, Long, Long, Long)].collect()
    assert(df.nonEmpty)
    assert(df.forall { case (_, _, _, off) => off >= 0 && off < 256 })
    // seq_id is nondecreasing in doc order and reconstructs the scan:
    // cum_before = seq_id * budget + tok_offset accumulates n_tokens
    var cum = 0L
    df.sortBy(_._1).foreach { case (_, n, seqId, off) =>
      assert(seqId * 256 + off === cum)
      cum += n
    }
  }

  test("p03 buckets are 1..4, quartile-balanced, and monotone in score") {
    val df = PackOps.qualityBuckets(spark, sfTiny)
      .select(col("quality_score"), col("bucket")).as[(Option[Double], Long)]
      .collect()
    assert(df.nonEmpty)
    assert(df.forall { case (_, b) => b >= 1 && b <= 4 })
    val sizes = df.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.max - sizes.values.min <= 1,
      s"quartiles must be balanced, got $sizes")
    val scored = df.collect { case (Some(q), b) => (q, b) }.sortBy(_._1).toSeq
    assert(scored.sliding(2).forall {
      case Seq((_, b1), (_, b2)) => b1 <= b2
      case _ => true
    }, "bucket must be nondecreasing in quality_score")
  }

  test("p04 keeps every 10th doc per source starting with the first") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    val want = docs.groupBy(_._2).values.flatMap { ds =>
      ds.map(_._1).sorted.zipWithIndex.collect { case (id, i) if i % 10 == 0 => id }.toSeq
    }.toSet
    val got = PackOps.stratifiedSample(spark, sfTiny)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === want)
  }

  test("p02 never splits a near-dup component across train and test") {
    val df = GraphOps.leakageSplit(spark, sfTiny)
      .select(col("component"), col("split")).as[(Long, String)].collect()
    assert(df.nonEmpty)
    assert(df.map(_._2).toSet.subsetOf(Set("train", "test")))
    val perComponent = df.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(perComponent.forall(_._2.size == 1),
      "all docs of a component must land in the same split")
  }
}
