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
      // buffer holds <= k entries, so 1M keys is a few hundred MB worst
      // case. Session-wide HERE is safe because this main's inputs are the
      // bounded test-SF tables; the user-facing CLI scopes the raise to
      // the vector modes (Main.topKHeapModes) so crawl-scale document
      // buffers (collect_list reassembly) keep Spark's spill-safe default
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
