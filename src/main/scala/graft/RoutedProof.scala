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
      // bounded-heap TopK aggregations (TypedImperative) stay in the HASH
      // aggregation path instead of sort-falling-back at 128 keys; each
      // buffer holds <= k entries, so 1M keys is a few hundred MB worst case
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // local mode frees shuffle files only when the ContextCleaner GCs
      // dereferenced RDDs; a 96g heap never GCs naturally, so multi-phase
      // proofs accumulate every stage's shuffle spill until ENOSPC
      .config("spark.cleaner.periodicGC.interval", "2min")
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

    import spark.implicits._
    val cents = index.centroids.get
    val distFn = graft.functions.Distances.metric(index.meta.metric)
    def shardsFor(qs: org.apache.spark.sql.DataFrame, pc: Int): (Long, Double) = {
      val probed = graft.operators.Ivf
        .probesAgg(qs, cents.select("cid", "cvector").distinct(), pc, distFn)
        .join(cents.select("cid", "pid"), "cid").select("qid", "pid").distinct()
        .localCheckpoint()
      val union = probed.select("pid").distinct().count()
      val perQuery = probed.groupBy("qid").count().agg(avg("count")).head().getDouble(0)
      (union, perQuery)
    }

    // ---- shape 1: CLUSTERED micro-batch (the serving-adjacent burst:
    // similar queries arrive together). Locality packing puts the probed
    // neighboring cells in one or two shards — the semi-join ships s/P of
    // the index, not all of it ----
    val base = index.nodes.filter(col("id") === 0L).select("vector")
      .head().getSeq[Float](0).toArray
    val clustered = Seq.tabulate(25) { j =>
      (j.toLong, base.updated(0, base(0) + j * 1e-3f))
    }.toDF("qid", "vector").localCheckpoint()
    val (clUnion, clPerQ) = shardsFor(clustered, 16)
    val clSecs = timedMin(2)(Hnsw.annQueryRouted(index, clustered, 10, probeCells = 16).count())
    val clAllSecs = timedMin(2)(Hnsw.annQueryLarge(index, clustered, 10).count())
    // the chooser must keep the clustered win: union ≪ P/2 → routed regime
    val clAdaptSecs = timedMin(2)(
      Hnsw.annQueryAdaptive(index, clustered, 10, probeCells = 16).count())
    System.err.println(f"[routed] clustered 25q pc=16: ships $clUnion/$p shards " +
      f"($clPerQ%.1f per query) $clSecs%.1f s vs all-shard $clAllSecs%.1f s " +
      f"(adaptive $clAdaptSecs%.1f s)")

    // ---- shape 2: LARGE uniform batch (the analytics shape: every shard
    // legitimately ships once — scanning the index once is optimal — but
    // per-task search work is q·s·ef instead of q·P·ef) ----
    val qBig = index.nodes.filter(col("id") % (n / 50000) === 0)
      .select(col("id").as("qid"), col("vector")).distinct().localCheckpoint()
    val nBig = qBig.count()
    val bigRoutedSecs = timedMin(2)(Hnsw.annQueryRouted(index, qBig, 10).count())
    val bigAllSecs = timedMin(2)(Hnsw.annQueryLarge(index, qBig, 10).count())
    // a 50k-query batch is search-dominated (q·ef ≥ nSub·P): the chooser's
    // short-circuit must keep the lazy always-routed plan — per-task
    // search work dwarfs the one-off sub-graph rebuilds even at union = P,
    // and no eager probe/decision jobs should run (adaptive ≈ routed here;
    // the dispersed-batch fallback belongs to LOW-volume batches, measured
    // at the 5M/250q ScaleProof point)
    val bigAdaptSecs = timedMin(2)(Hnsw.annQueryAdaptive(index, qBig, 10).count())
    System.err.println(f"[routed] large batch ($nBig queries): routed $bigRoutedSecs%.1f s " +
      f"vs all-shard $bigAllSecs%.1f s (adaptive $bigAdaptSecs%.1f s)")

    // ---- shape 3: probe sweep on a small uniform batch (cost vs budget) ----
    val queries = index.nodes.filter(col("id") % (n / 25) === 0)
      .select(col("id").as("qid"), col("vector")).distinct().localCheckpoint()
    val sweep = Seq(4, 16, 64, c).map { pc =>
      val (union, perQ) = shardsFor(queries, pc)
      val secs = timedMin(2)(Hnsw.annQueryRouted(index, queries, 10, probeCells = pc).count())
      System.err.println(f"[routed] probeCells=$pc%3d -> union $union%2d/$p shards, " +
        f"$perQ%.1f per query, $secs%.1f s")
      (pc, union, perQ, secs)
    }
    val allSecs = timedMin(2)(Hnsw.annQueryLarge(index, queries, 10).count())
    System.err.println(f"[routed] all-shard reference (25q): $p shards, $allSecs%.1f s")

    val sweepJson = sweep.map { case (pc, union, perQ, secs) =>
      s"""{"probe_cells":$pc,"shards_union":$union,"shards_per_query":$perQ,"sec":$secs}"""
    }.mkString("[", ",", "]")
    val line = s"""{"n":$n,"dim":$dim,"num_partitions":$p,"num_cells":$c,""" +
      s""""routed_build_sec":$buildSecs,""" +
      s""""clustered_q":25,"clustered_shards_union":$clUnion,"clustered_shards_per_query":$clPerQ,""" +
      s""""clustered_routed_sec":$clSecs,"clustered_allshard_sec":$clAllSecs,""" +
      s""""clustered_adaptive_sec":$clAdaptSecs,""" +
      s""""large_q":$nBig,"large_routed_sec":$bigRoutedSecs,"large_allshard_sec":$bigAllSecs,""" +
      s""""large_adaptive_sec":$bigAdaptSecs,""" +
      s""""sweep":$sweepJson,"allshard_sec":$allSecs}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_ROUTED_OUT", "BENCH_ROUTED.json")), line + "\n")
    catch { case e: Throwable => System.err.println(s"[routed] could not write artifact: $e") }
    spark.stop()
  }
}
