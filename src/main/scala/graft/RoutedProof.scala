package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}

/** Focused scale evidence for the centroid-routed query path: QUERY COST
  * TRACKS PROBED SHARDS, NOT TOTAL SHARDS — the property that makes the
  * flagship component survive P in the thousands. The 5M ScaleProof
  * already pins the recall side (routed ≥ 0.98× all-shard at C/4); this
  * main pins the cost side on one locality-sharded index:
  *
  *   - a SMALL query batch (the serving-adjacent shape: few queries per
  *     micro-batch) is answered at probe budgets from 1 cell up to all C,
  *     timing each and counting the shards the probe actually shipped;
  *   - the all-shard path over the same index is the P-cost reference.
  *
  * Expected shape — and what the committed JSON shows: wall time grows
  * with the probed-shard count and the full-probe point converges to the
  * all-shard cost; at 100× the data (P in the thousands) the routed
  * query's cost is set by its probe budget s, while every all-shard query
  * pays P. Run:
  *
  *   SPARK_DRIVER_MEM=32g sbt "runMain graft.RoutedProof [n]"
  */
object RoutedProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-routed-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timedMin[T](reps: Int)(f: => T): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val p = 64
    val params = HnswParams(dim = dim, m = 12, efConstruction = 100, numPartitions = p)
    val input = graft.sources.Datagen.gaussianVectors(spark, n, dim)
    val t0 = System.nanoTime()
    val idx0 = Hnsw.buildRouted(input, params) // C = 256 cells
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val index = idx0.copy(nodes = idx0.nodes.cache(), edges = idx0.edges.cache())
    index.nodes.count(); index.edges.count()
    val c = index.meta.num_cells
    System.err.println(f"[routed] build $n x $dim, P=$p, C=$c in $buildSecs%.1f s")

    // 25 queries — a serving-shaped micro-batch, small enough that shard
    // pruning is visible (a huge uniform batch touches every shard anyway)
    val queries = index.nodes.filter(col("id") % (n / 25) === 0)
      .select(col("id").as("qid"), col("vector")).distinct().localCheckpoint()
    val cents = index.centroids.get
    val distFn = graft.functions.Distances.metric(index.meta.metric)

    val sweep = Seq(4, 16, 64, c).map { pc =>
      val shards = graft.operators.Ivf
        .probesAgg(queries, cents.select("cid", "cvector").distinct(), pc, distFn)
        .join(cents.select("cid", "pid"), "cid").select("pid").distinct().count()
      val secs = timedMin(2)(Hnsw.annQueryRouted(index, queries, 10, probeCells = pc).count())
      System.err.println(f"[routed] probeCells=$pc%3d -> $shards%2d/$p shards shipped, $secs%.1f s")
      (pc, shards, secs)
    }
    val allSecs = timedMin(2)(Hnsw.annQueryLarge(index, queries, 10).count())
    System.err.println(f"[routed] all-shard reference: $p shards, $allSecs%.1f s")

    val sweepJson = sweep.map { case (pc, shards, secs) =>
      s"""{"probe_cells":$pc,"shards_shipped":$shards,"sec":$secs}"""
    }.mkString("[", ",", "]")
    val line = s"""{"n":$n,"dim":$dim,"num_partitions":$p,"num_cells":$c,""" +
      s""""routed_build_sec":$buildSecs,"sweep":$sweepJson,"allshard_sec":$allSecs}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_ROUTED_OUT", "BENCH_ROUTED.json")), line + "\n")
    catch { case e: Throwable => System.err.println(s"[routed] could not write artifact: $e") }
    spark.stop()
  }
}
