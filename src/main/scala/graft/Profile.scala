package graft

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"=== $name ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    audit("q06_forecast_revenue")(graft.operators.Relational.forecastRevenue(spark, d))
    audit("q02_revenue_by_nation")(graft.operators.Relational.revenueByNation(spark, d))
    audit("q03_top_orders")(graft.operators.Relational.topOrders(spark, d))
    audit("m03_top_vocab")(graft.ml.MlQueries.topVocab(spark, d))
    audit("e01_knn")(graft.operators.EmbeddingOps.knnBruteForce(spark, d))
    spark.stop()
  }
}
