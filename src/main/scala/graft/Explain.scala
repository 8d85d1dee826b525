package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints the formatted physical plan of selected
  * SparkEntry queries (all when no names given). Used to keep plans honest:
  * filters pushed to the parquet scan, small sides broadcast, wide
  * whole-stage-codegen spans, no stray shuffles.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===================== $name =====================")
      try println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
