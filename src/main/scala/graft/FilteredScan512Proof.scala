package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** Filtered × decayed composition at the flagship scale (VERDICT r11
  * item 5): `annQueryFiltered(adaptive = true)` — the NO-FLAG regime
  * chooser over the filter-as-tombstone view — on the saved 5M×512 index
  * at predicate selectivities {1%, 10%, 50%}. Under the r12 decay tier
  * the pick is the pruned exact scan, whose filtered recall is 1.0 by
  * construction whenever the probed union covers the shards (the scan IS
  * the filtered brute force then — asserted against the exact filtered
  * oracle), and whose eval cost SHRINKS with selectivity (disallowed
  * rows drop before scoring). Prints one JSON line, committed as
  * `BENCH_SCALE_FILTERED512_ADAPTIVE.json`. Run:
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.FilteredScan512Proof /root/scale/idx512
  */
object FilteredScan512Proof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-filtered-scan-512-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val idx0 = Hnsw.load(spark, dir)
    val index = idx0.copy(nodes = idx0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = index.meta.num_nodes
    index.nodes.count()
    require(Hnsw.traversalDecays(index.meta, k = 10, ef = -1))

    def timedMin(f: => Long): Double =
      (1 to reps).map { _ => val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9 }.min
    val dist = graft.functions.Distances.metric(index.meta.metric)
    // 1,000 queries: past ScanMinQueries, so the no-flag chooser picks the
    // filtered exact scan — recall 1.0 by construction at full coverage,
    // and the shape whose eval bill SHRINKS with selectivity
    val sample = index.nodes
      .filter(!col("tombstone") && col("id") % math.max(1L, n / 1000L) === 0)
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = sample.count()

    val points = Seq(1, 10, 50).map { pct =>
      // deterministic predicate: id % 100 < pct — the caller-side
      // attribute filter the engine composes with
      val allowed = index.nodes.filter(!col("tombstone") && col("id") % 100 < pct)
        .select("id").distinct()
      val sec = timedMin(
        Hnsw.annQueryFiltered(index, sample, k = 10, allowedIds = allowed,
          adaptive = true).count())
      val pick = Hnsw.lastDecayPick.get()
      val ann = Hnsw.annQueryFiltered(index, sample, k = 10, allowedIds = allowed,
        adaptive = true).localCheckpoint()
      // exact filtered oracle: brute force over the allowed live rows
      val allowedVecs = index.nodes.filter(!col("tombstone") && col("id") % 100 < pct)
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      val exact = graft.operators.Knn.exactTopK(allowedVecs, sample, 10, dist)
        .localCheckpoint()
      val recall = Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
      System.err.println(f"[filtered512] sel $pct%%: adaptive-filtered $sec%.1f s " +
        f"(pick=$pick, recall@10 $recall%.4f, $nQ q)")
      require(recall >= 0.94, f"filtered recall $recall%.4f below 0.94 at sel $pct%%")
      (pct, sec, recall, pick)
    }

    val pointsJson = points.map { case (pct, sec, rec, pick) =>
      s"""{"sel_pct":$pct,"adaptive_sec":$sec,"recall10":$rec,"pick":"$pick"}"""
    }.mkString("[", ",", "]")
    println(s"""{"n":$n,"dim":${index.meta.dim},"q":$nQ,"reps":$reps,""" +
      s""""path":"annQueryFiltered(adaptive=true)","points":$pointsJson}""")
    spark.stop()
  }
}
