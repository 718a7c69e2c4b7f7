package graft

/** t1-style smoke: run the flagship entry query and print its row count
  * (driver checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"entry rows: ${df.count()}")
    spark.stop()
  }
}
