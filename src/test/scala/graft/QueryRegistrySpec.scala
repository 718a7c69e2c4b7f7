package graft

import org.apache.spark.sql.functions._

/** Registry hygiene + a smoke pass of every non-iterative query at
  * sf0.001 (the ML-fit queries m06-m09 are exercised by their own specs
  * and by the driver's Verify run — re-fitting K-means/LDA here would
  * double the suite's runtime for no new coverage). */
class QueryRegistrySpec extends SparkSpec {

  private val mlFits = Set("m06_kmeans_stats", "m07_lda_optimize",
    "m08_cluster_merge", "m09_refiner_report")

  test("query names are unique and every oracle belongs to a query") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    val qset = names.toSet
    SparkEntry.oracleSql.keys.foreach(k => assert(qset.contains(k), s"orphan oracle $k"))
    assert(names.size >= 43)
  }

  test("every non-iterative query runs at sf0.001") {
    QueryRegistry.all.filterNot(q => mlFits(q.name)).foreach { q =>
      val n = q.fn(spark, sfTiny).count()
      assert(n >= 0, s"${q.name} failed")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct is within 10% of exact counts") {
    val approx = graft.operators.Relational.approxDistinct(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sfTiny)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.10, s"flag $k: approx $ap vs exact $ex")
    }
  }
}
