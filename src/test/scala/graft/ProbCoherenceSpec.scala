package graft

import graft.coherence.ProbCoherence

/** Hand-computed golden value for the Mimno coherence decomposition
  * (textmineR CalcProbCoherence semantics, ref 02_build_models.R:466-471). */
class ProbCoherenceSpec extends SparkSpec {
  import spark.implicits._

  test("coherence = mean over pairs of P(wj|wi) - P(wj)") {
    // cluster 0, 4 docs: a in {1,2,3}, b in {1,2}, c in {4}
    val docTerms = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (4L, "c"),
      (1L, "a") // duplicate mention — must be binarized away
    ).toDF("doc_id", "term")
    val assignments = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0))
      .toDF("doc_id", "cluster")
    val topTerms = Seq((0, "a", 1L), (0, "b", 2L))
      .toDF("cluster", "term", "rnk")

    val got = ProbCoherence.perCluster(docTerms, assignments, topTerms)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    // single pair (a,b): D(a,b)/D(a) - D(b)/N = 2/3 - 2/4 = 1/6
    assert(got === Array((0, 0.166667, 4L)))
  }

  test("zero co-occurrence pairs still score (negative contribution)") {
    // a in {1}, b in {2}; never together. score = 0/1 - 1/2 = -0.5
    val docTerms = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "term")
    val assignments = Seq((1L, 0), (2L, 0)).toDF("doc_id", "cluster")
    val topTerms = Seq((0, "a", 1L), (0, "b", 2L)).toDF("cluster", "term", "rnk")
    val got = ProbCoherence.perCluster(docTerms, assignments, topTerms)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(got === Array((0, -0.5, 2L)))
  }
}
