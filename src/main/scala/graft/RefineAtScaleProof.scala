package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** The ≥ 0.9-recall operating-point levers at the LARGEST scale point:
  * loads a saved routed 512-dim index (built once by
  * [[RoutedDim512Proof]] `... build none`) and measures, per JVM-sized
  * phase, the two levers `BENCH_SCALE_REFINE512.json` pins at 1M/2M:
  *
  *   - exact-probed search ([[Hnsw.annQueryRoutedExact]]) at a probe
  *     sweep — recall here IS routing recall (brute force within probed
  *     shards), 1.0 at full probe by construction (gated ≥ 0.999);
  *   - the ef lever on the routed traversal (ef past the 200 default).
  *
  * Phases via arg 3 (comma list of "exact:<pc>" / "ef:<ef>"), so the
  * disk discipline of the 5M runs holds: one-or-two phases per JVM,
  * each JVM freeing its shuffle on exit. Prints one JSON line per run;
  * rows merge into `BENCH_SCALE_REFINE512.json`.
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.RefineAtScaleProof \
  *     /tmp/idx512 5000000 exact:64,exact:128
  */
object RefineAtScaleProof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("arg 1: saved index dir"))
    val n = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val phases = args.lift(2).getOrElse("exact:64")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-refine-at-scale")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }
    val idx0 = Hnsw.load(spark, dir)
    val index = idx0.copy(nodes = idx0.nodes.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      edges = idx0.edges.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    index.nodes.count()
    val c = index.meta.num_cells
    System.err.println(s"[refine512] loaded ${index.meta.num_nodes} nodes, C=$c")

    val uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
    val nRecallQ = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "100").toLong
    val sample = uniq.filter(col("id") % (n / nRecallQ) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = sample.count()
    val dist = graft.functions.Distances.metric(index.meta.metric)
    val exact = graft.operators.Knn.exactTopK(uniq, sample, 10, dist).localCheckpoint()

    val points = phases.map { ph =>
      val Array(kind, v) = ph.split(":")
      val param = v.toInt
      val (ann, sec) = timed((kind match {
        case "exact" => Hnsw.annQueryRoutedExact(index, sample, 10, probeCells = param)
        case "ef" => Hnsw.annQueryRouted(index, sample, 10, probeCells = c, ef = param)
        case other => sys.error(s"unknown phase kind '$other'")
      }).localCheckpoint())
      val r = Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
      System.err.println(f"[refine512] $kind:$param recall@10 $r%.4f ($sec%.1f s)")
      if (kind == "exact" && param >= c)
        require(r >= 0.999, f"full-probe exact recall $r%.4f below 0.999")
      (kind, param, r, sec)
    }
    val json = points.map { case (k, p, r, s) =>
      s"""{"kind":"$k","param":$p,"recall10":$r,"sec":$s}""" }.mkString("[", ",", "]")
    println(s"""{"n":$n,"dim":${index.meta.dim},"num_cells":$c,""" +
      s""""recall_queries":$nQ,"resumed_from":"$dir","points":$json}""")
    spark.stop()
  }
}
