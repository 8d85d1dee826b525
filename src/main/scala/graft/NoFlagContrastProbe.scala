package graft

import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** Engineering probe (recall-only, no timing): the small-batch no-flag
  * contrast on the saved capped index — below the r14 scan floor
  * (q &lt; [[Hnsw.ScanMinQueries]]) the chooser stays on the probed join,
  * which is exactly where the capped index's C/4 recall drop (0.84,
  * BENCH_SCALE_SPILLCAP512_5M.json) lives; the calibrated no-flag
  * default must lift THIS regime, since q ≥ floor batches take the
  * exact scan (recall 1.0) regardless. Folded into
  * BENCH_SCALE_SCANTIER512_CAPPED.json as noflag_contrast25; the
  * section also runs inside ScanTierDim512Proof on future full runs.
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.NoFlagContrastProbe /root/scale/idx512
  */
object NoFlagContrastProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-noflag-contrast-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx0 = Hnsw.load(spark, dir)
    val full = idx0.copy(nodes = idx0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    require(full.calibration.nonEmpty, s"$dir must carry calibration.json")
    val bare = full.copy(pq = None, calibration = Nil)
    val calOnly = full.copy(pq = None)
    val n = full.meta.num_nodes
    full.nodes.count()
    val uniq = full.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
    val s25 = full.nodes
      .filter(!col("tombstone") && col("id") % math.max(1L, n / 25L) === 0)
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val dist = graft.functions.Distances.metric(full.meta.metric)
    val exact25 = graft.operators.Knn.exactTopK(uniq, s25, 10, dist).localCheckpoint()
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
      Hnsw.recallAtK(ann, exact25, 10).agg(avg("recall")).head().getDouble(0)
    val rBare = recallOf(Hnsw.annQueryAdaptive(bare, s25, k = 10).localCheckpoint())
    val barePick = Hnsw.lastDecayPick.get()
    val rCal = recallOf(Hnsw.annQueryAdaptive(calOnly, s25, k = 10).localCheckpoint())
    val calProbe = Hnsw.lastAdaptiveProbe.get()
    System.err.println(f"[noflag25] bare C/4 recall@10 $rBare%.4f ($barePick) vs " +
      f"calibrated no-flag $rCal%.4f (probe $calProbe)")
    println(s"""{"q":25,"bare_recall10":$rBare,"bare_pick":"$barePick",""" +
      s""""calibrated_recall10":$rCal,"calibrated_probe":$calProbe}""")
    spark.stop()
  }
}
