package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** Engineering probe (not a BENCH artifact): the r14 quiet re-measure of
  * the capped 5M×512 index showed the probed JOIN losing ~3× to the
  * pruned SCAN at uniform 100 queries (67.2 s vs 23.2 s) — a point the
  * r13 contended run had inverted (17.9 vs 59.2) and that
  * [[Hnsw.ScanMinQueries]]=512 mis-chooses. This probe sweeps the
  * uniform-query axis AND the clustered axis on the saved index,
  * printing join/scan wall plus the decision statistics (routeRows,
  * union) at each point, so the small-batch tier's rule is re-anchored
  * on quiet capped-geometry data instead of the r12 clustered
  * extrapolation. Conclusions live in the decay-tier scaladoc.
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.UniformBreakevenProbe /root/scale/idx512
  */
object UniformBreakevenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-uniform-breakeven-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val idx0 = Hnsw.load(spark, dir)
    val index = idx0.copy(nodes = idx0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      pq = None, calibration = Nil)
    val n = index.meta.num_nodes
    val dim = index.meta.dim
    index.nodes.count()
    def timedMin(f: => Long): Double =
      (1 to reps).map { _ => val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.min

    // warm-up: run BOTH plan families once untimed (q=25) so the sweep's
    // first timed point doesn't carry whole-stage-codegen + C2 JIT
    // compilation of the join/scan operators — the r14 scantier run
    // measured the same probed-join plan at 67.2 s first-in-JVM and
    // 21.4 s later in the same JVM
    {
      val warm = index.nodes
        .filter(!col("tombstone") && col("id") % math.max(1L, n / 25L) === 7L)
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
        .select(col("id").as("qid"), col("vector")).localCheckpoint()
      Hnsw.annQueryRoutedExact(index, warm, k = 10).count()
      Hnsw.annQueryPrunedExact(index, warm, k = 10).count()
      System.err.println("[breakeven] warm-up done")
    }

    def point(label: String, sample: org.apache.spark.sql.DataFrame): Unit = {
      val q = sample.count()
      val st = Hnsw.probedPidsFor(index, sample, -1)
        .agg(count(lit(1)), countDistinct(col("pid"))).head()
      val (routeRows, union) = (st.getLong(0), st.getLong(1))
      val joinSec = timedMin(Hnsw.annQueryRoutedExact(index, sample, k = 10).count())
      val scanSec = timedMin(Hnsw.annQueryPrunedExact(index, sample, k = 10).count())
      System.err.println(f"[breakeven] $label q=$q routeRows=$routeRows union=$union: " +
        f"join $joinSec%.1f s, scan $scanSec%.1f s (ratio ${joinSec / scanSec}%.2f)")
    }

    Seq(10L, 25L, 50L, 100L, 250L).foreach { nQ =>
      val sample = index.nodes
        .filter(!col("tombstone") && col("id") % math.max(1L, n / nQ) === 0)
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
        .select(col("id").as("qid"), col("vector")).localCheckpoint()
      point("uniform", sample)
    }
    // clustered batches: perturbations of one stored vector (the r11
    // clustered-artifact construction) — the join's home regime
    val center = index.nodes.filter(col("id") === 17L).head()
      .getAs[scala.collection.Seq[Float]]("vector").toArray
    Seq(25, 100, 600).foreach { m =>
      val qs = (0 until m).map { i =>
        (100000L + i, center.zipWithIndex.map { case (v, j) =>
          v + (if (j == i % dim) 0.05f else 0.0f) })
      }.toDF("qid", "vector").localCheckpoint()
      point("clustered", qs)
    }
    spark.stop()
  }
}
