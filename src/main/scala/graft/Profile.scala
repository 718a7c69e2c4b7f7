package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler / plan auditor (not part of the driver contract). */
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
    def docTermsNarrow(docs: DataFrame): DataFrame = {
      val toks = docs.select(col("doc_id"), Featurize.wordsCol(col("text")).as("w1"))
      val g3 = TextFunctions.withNgrams(
        TextFunctions.withNgrams(toks, "w1", "w2", 2), "w1", "w3", 3)
      g3.select(col("doc_id"),
          explode(concat(col("w1"), col("w2"), col("w3"))).as("term"))
        .filter(col("term") =!= "")
    }
    def countsOf(dt: DataFrame): Long =
      dt.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt")).count()
    val docs = Tables.documents(spark, d)
    for (r <- 1 to 3) {
      time(s"counts narrow r$r")(countsOf(docTermsNarrow(docs)))
      time(s"counts wide   r$r")(countsOf(Featurize.docTerms(docs)))
    }
    spark.stop()
  }
}
