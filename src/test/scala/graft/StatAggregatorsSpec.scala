package graft

import graft.functions.StatAggregators
import org.apache.spark.sql.functions._

/** WelfordVar: the custom typed Aggregator must be value-identical to
  * Spark's native var_samp (both sample variance), stay stable where a
  * naive sum-of-squares buffer loses precision, and be partitioning-
  * invariant (Chan's merge is associative, so the partial-agg tree
  * shape cannot change the answer). */
class StatAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("welfordVar matches native var_samp on real data") {
    val li = graft.sources.Tables.lineitem(spark, sfTiny)
    val r = li.groupBy(col("l_returnflag"))
      .agg(
        StatAggregators.welfordVar(col("l_quantity").cast("double")).as("w"),
        var_samp(col("l_quantity")).as("v"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w, v) = (row.getDouble(1), row.getDouble(2))
      assert(math.abs(w - v) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"flag=${row.get(0)}: welford=$w native=$v")
    }
  }

  test("welfordVar is stable when mean >> stddev") {
    // Values 1e9 + {0,1,2}: true sample variance is exactly 1. A naive
    // sum(x^2) - n*mean^2 buffer at this magnitude is dominated by the
    // ~1e18 cancellation; Welford must stay exact to double precision.
    val xs = Seq(1e9, 1e9 + 1.0, 1e9 + 2.0).toDF("x")
    val w = xs.agg(StatAggregators.welfordVar(col("x"))).head().getDouble(0)
    assert(math.abs(w - 1.0) < 1e-6, s"welford=$w expected 1.0")
  }

  test("welfordVar is partitioning-invariant") {
    val base = (1 to 1000).map(i => (i % 7, (i * 31 % 97).toDouble)).toDF("g", "x")
    val one = base.coalesce(1)
      .groupBy($"g").agg(StatAggregators.welfordVar($"x").as("v"))
    val many = base.repartition(32, $"x")
      .groupBy($"g").agg(StatAggregators.welfordVar($"x").as("v"))
    val joined = one.as("a").join(many.as("b"), "g")
      .select($"a.v".as("va"), $"b.v".as("vb")).collect()
    assert(joined.length === 7)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("welfordVar yields NaN below two observations") {
    val w = Seq(42.0).toDF("x")
      .agg(StatAggregators.welfordVar(col("x"))).head().getDouble(0)
    assert(w.isNaN)
  }
}
