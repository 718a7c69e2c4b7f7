package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions.col

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
                 maxRounds: Int = 25): Map[Long, Long] =
    GraphOps.connectedComponents(
        nodes.toDF("id"), edges.toDF("src", "dst"), maxRounds)
      .as[(Long, Long)].collect().toMap

  test("chain propagates the min id across the full diameter") {
    // 1-2-3-4-5 needs multiple rounds — catches early-stop bugs
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L),
      Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct min labels; isolated node is its own") {
    val got = cc(Seq(1L, 2L, 3L, 10L, 11L, 99L),
      Seq(2L -> 1L, 2L -> 3L, 11L -> 10L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("edge orientation does not matter and self-loops are harmless") {
    val got = cc(Seq(1L, 2L, 3L), Seq(3L -> 2L, 2L -> 2L, 1L -> 3L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("no edges means every node is a singleton component") {
    val got = cc(Seq(4L, 7L), Seq.empty)
    assert(got === Map(4L -> 4L, 7L -> 7L))
  }

  test("non-convergence within maxRounds fails loudly instead of returning partial labels") {
    val nodes = (1L to 12L)
    val chain = nodes.init.map(i => i -> (i + 1))
    intercept[IllegalArgumentException] {
      cc(nodes, chain, maxRounds = 2)
    }
  }

  test("d10 composition: planted cliques collapse through the REAL LSH path; shingle-less docs stay split") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // organic dup of 0
      (2L, "completely different content about solar panels and batteries"),
      (3L, "hi"),              // 1 token — no 3-gram shingle
      (4L, "two tokens only"), // exactly one shingle
      (5L, "")                 // empty
    ).toDF("doc_id", "text")
    val (labels, off) = GraphOps.productionDedupLabels(docs)
    val flags = GraphOps.cliqueFlags(labels, off)
      .as[(Long, Int)].collect().toMap
    assert(flags === Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 0))
    // the organic dup pair and ALL its planted copies merge into ONE
    // component — merged cliques must not break the per-doc flag
    val lab = labels.as[(Long, Long)].collect().toMap
    val merged = Seq(0L, 1L, off, 1L + off, 2 * off, 1L + 2 * off).map(lab)
    assert(merged.distinct.size === 1)
    // while distinct content stays apart
    assert(lab(2L) !== lab(0L))
  }

  test("leakage-split hash stays int64-safe and in [0,10) for huge component ids") {
    import org.apache.spark.sql.functions.expr
    val masked = expr("component % 65536 * 2654435761 % 4294967296 % 10")
    val huge = Seq(5000000000L, Long.MaxValue / 3, 1234567890123L)
      .toDF("component")
    val got = huge.select(masked.as("b")).as[Long].collect()
    assert(got.forall(b => b >= 0 && b < 10),
      s"masked hash left [0,10): ${got.mkString(",")}")
    // and is the identity of the unmasked formula on window-scale ids
    val small = (0L until 1000L).toDF("component")
    val a = small.select(masked.as("b")).as[Long].collect().toSeq
    val b = small
      .select(expr("component * 2654435761 % 4294967296 % 10").as("b"))
      .as[Long].collect().toSeq
    assert(a === b)
  }

  test("d07 keeps exactly one representative per component on the corpus") {
    val df = GraphOps.neardupComponents(spark, sfTiny)
    val byComponent = df.groupBy(col("component"))
      .agg(org.apache.spark.sql.functions.sum(col("keep")).as("n_keep"))
      .as[(Long, Long)].collect()
    assert(byComponent.nonEmpty)
    assert(byComponent.forall(_._2 == 1L),
      "every component must keep exactly its min-id representative")
    // representative is the component label itself
    val reps = df.filter(col("keep") === 1)
      .select(col("doc_id"), col("component")).as[(Long, Long)].collect()
    assert(reps.forall { case (id, comp) => id == comp })
  }
}
