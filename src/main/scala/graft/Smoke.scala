package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: run SparkEntry.entry on
  * sf0.001 and assert rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"SMOKE rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
  }
}
