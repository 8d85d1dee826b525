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
      // bounded-heap TopK aggregations (TypedImperative) stay in the HASH
      // aggregation path instead of sort-falling-back at 128 keys; each
      // buffer holds <= k entries, so 1M keys is a few hundred MB worst case
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
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
