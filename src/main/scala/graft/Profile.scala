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
}
