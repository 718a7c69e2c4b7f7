package graft

import org.apache.spark.sql.functions._

/** Scratch profiler / plan auditor (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-profile")
    import spark.implicits._
    println("extensions conf: " + spark.conf.getOption("spark.sql.extensions"))
    val vecs = Seq((1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("id", "a", "b")
    val q = vecs.select(graft.functions.VectorFunctions.dot(col("a"), col("b")).as("d"))
    println("=== analyzed ===")
    println(q.queryExecution.analyzed.expressions.map(_.treeString).mkString("\n"))
    println("=== optimized ===")
    println(q.queryExecution.optimizedPlan.expressions.map(_.treeString).mkString("\n"))
    spark.stop()
  }
}
