package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler / plan auditor (not part of the driver contract).
  * A/Bs the narrow (historical) winnowing shape against the shipped
  * `TextOps.winnowFrom` — the wide arm calls the production code
  * directly so the numbers always describe what actually ships. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    if (args.headOption.contains("q33")) { q33AB(spark, d); spark.stop(); return }
    import graft.features.Featurize
    import graft.functions.TextFunctions
    import graft.sources.Tables
    def sink(df: DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 1L
    }
    // Historical narrow shape, kept ONLY as the A/B baseline: filter
    // before the fanout (pushed below any repartition), single-threaded
    // scan stage. The hash constants mirror winnowFrom deliberately.
    val k = 5
    val w = 8
    val poly = (1 until k).foldLeft((ascii(expr("substring(c, pos, 1)")) % 32)
        .cast("long")) { (acc, i) =>
      acc * 32L + (ascii(expr(s"substring(c, pos + $i, 1)")) % 32).cast("long")
    }
    val gramHash = (poly * 2654435761L) % 4294967296L
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    def narrow = Tables.documents(spark, d)
      .select(col("doc_id"), TextFunctions.cleanText(col("text")).as("c"))
      .filter(length(col("c")) >= k)
      .select(col("doc_id"), col("c"),
        explode(sequence(lit(1), length(col("c")) - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"), gramHash.as("h"))
      .withColumn("mh", min(col("h")).over(win))
      .filter(col("h") === col("mh"))
      .select(col("doc_id"), col("h").as("fp"))
      .distinct()
      .orderBy(col("doc_id"), col("fp"))
    def countsOf(dt: DataFrame): Long =
      dt.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt")).count()
    for (r <- 1 to 3) {
      time(s"t08 narrow r$r")(sink(narrow))
      time(s"t08 wide   r$r")(sink(
        graft.operators.TextOps.winnowFrom(Tables.documents(spark, d))))
      time(s"m01 wide   r$r")(countsOf(Featurize.docTerms(Tables.documents(spark, d))))
    }
    spark.stop()
  }

  /** q33 stage A/B (r9 verdict item 3): where does the ~1 s go —
    * the driver-side `df.stat.bloomFilter` merge, or the probe-UDF
    * aggregates? Also times the expression-friendly alternative (exact
    * broadcast anti-join flags, no sketch at all) for comparison. */
  private def q33AB(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import graft.sources.Tables
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    for (r <- 1 to 3) {
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_returnflag"))
      time(s"scan+checkpoint      r$r") { li.localCheckpoint(); li.count() }
      val lic = li.localCheckpoint()
      val members = lic.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
      var nMembers = 0L
      time(s"members distinct     r$r") { nMembers = members.count(); nMembers }
      var bf: org.apache.spark.util.sketch.BloomFilter = null
      time(s"bloom build (driver) r$r") {
        bf = members.stat.bloomFilter("l_orderkey", math.max(nMembers, 1L), 0.03)
        1L
      }
      val mc = udf((k: Long) => bf.mightContain(k))
      val nonMembers = lic.select(col("l_orderkey")).distinct()
        .join(members, Seq("l_orderkey"), "left_anti")
      time(s"probe UDF aggs       r$r") {
        val fn = members.agg(count(lit(1)).as("n_members"),
          sum(when(mc(col("l_orderkey")), 0L).otherwise(1L)).as("n_false_neg"))
        val fp = nonMembers.agg(count(lit(1)).as("n_non_members"),
          sum(when(mc(col("l_orderkey")), 1L).otherwise(0L)).as("n_fp"))
        fn.crossJoin(fp).collect(); 1L
      }
      time(s"exact-join alt       r$r") {
        // sketch-free baseline: membership via broadcast anti-join only
        lic.select(col("l_orderkey")).distinct()
          .join(broadcast(members.withColumn("m", lit(1))),
            Seq("l_orderkey"), "left")
          .agg(sum(when(col("m").isNull, 1L).otherwise(0L)),
            count(lit(1))).collect(); 1L
      }
      // the shipped shape after the A/B: one flagged distinct + one
      // probe pass (4 jobs total, all internal to this timer)
      time(s"shipped single-pass  r$r") {
        graft.operators.Relational.bloomFilterCheck(spark, d).collect(); 1L
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }
}
