package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** Engineering probe (not a BENCH artifact): re-measures the per-query
  * probed JOIN form at the uniform 100/1,000-query points AFTER the r12
  * TopKBuffer fast-reject fix — r11's "13× per eval" attribution was
  * measured with the dedup heap doing a k-element indexOf on every scored
  * row, which the fix removed, so the scan-vs-join calibration must be
  * re-anchored. Conclusions live in the JoinScanEvalRatio scaladoc.
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.ExactJoinProbe /root/scale/idx512
  */
object ExactJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-exact-join-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val idx0 = Hnsw.load(spark, dir)
    val index = idx0.copy(nodes = idx0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = index.meta.num_nodes
    index.nodes.count()
    def timedMin(f: => Long): Double =
      (1 to reps).map { _ => val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.min
    Seq(100L, 1000L).foreach { nQ =>
      val sample = index.nodes
        .filter(!col("tombstone") && col("id") % math.max(1L, n / nQ) === 0)
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
        .select(col("id").as("qid"), col("vector")).localCheckpoint()
      val q = sample.count()
      val joinSec = timedMin(Hnsw.annQueryRoutedExact(index, sample, k = 10).count())
      System.err.println(f"[joinprobe] uniform $q q: probed-join $joinSec%.1f s")
    }
    spark.stop()
  }
}
