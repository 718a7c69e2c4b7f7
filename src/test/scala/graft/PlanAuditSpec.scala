package graft

/** Physical-plan audits: the scale-critical plan properties claimed in
  * the operator docs, pinned as assertions so a refactor can't silently
  * regress them (a correct-but-cartesian plan is a failure at 100 TB
  * even when the rows match).
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfTiny).queryExecution.executedPlan.toString

  test("q01: predicate pushed into the parquet scan, columns pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
    // projection reaches the scan: the lineitem comment column is never read
    assert(!p.contains("l_comment"))
  }

  test("q02: the dimension-chain joins all broadcast — no shuffle joins") {
    val p = plan("q02_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("ShuffledHashJoin"))
  }

  test("m03: vocabulary selection plans TakeOrderedAndProject, not a global sort") {
    val p = plan("m03_top_vocab")
    assert(p.contains("TakeOrderedAndProject(limit=2000"))
  }

  test("e02: the verification cap is pushed into BOTH scan sides") {
    val p = plan("e02_similar_pairs")
    assert("LessThan\\(vec_id,1000\\)".r.findAllIn(p).size === 2)
  }

  test("widenForFanout widens a narrow source and leaves a wide one alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val narrow = spark.range(1000).toDF("doc_id").coalesce(1)
    val widened = graft.sources.Scans.widenForFanout(narrow, col("doc_id"))
    assert(widened.rdd.getNumPartitions > 1)
    val alreadyWide = spark.range(1000).toDF("doc_id")
      .repartition(spark.sparkContext.defaultParallelism)
    val untouched = graft.sources.Scans.widenForFanout(alreadyWide, col("doc_id"))
    assert(untouched.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("no registered query plans an unconditioned CartesianProduct") {
    // CartesianProductExec appears only when Spark has no join condition
    // and no broadcastable side — every cross in this engine is either a
    // broadcast of a 1-row/limit-bounded relation or a capped
    // BroadcastNestedLoopJoin with a residual condition.
    val skipped = Set[String]() // every query must hold the invariant
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !skipped.contains(name)) {
      val p = fn(spark, sfTiny).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }
}
