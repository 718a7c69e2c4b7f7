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
