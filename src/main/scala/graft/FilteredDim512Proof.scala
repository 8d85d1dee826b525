package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** Filtered-ANN selectivity proof at 1M × dim-512: the route-through
  * (filter-as-tombstone) traversal vs the exact filtered oracle at
  * predicate selectivities {1%, 10%, 50%} — the open question VERDICT r9
  * flagged ("recall-gated only at spec scale"). For each selectivity:
  *
  *   - routed traversal + filter at ef=200 (the default budget) and at
  *     ef ≈ 2k/s (the documented `ef ≳ k/s` guidance — a layer-0 sweep
  *     of width ef keeps ≈ s·ef allowed candidates);
  *   - [[Hnsw.annQueryRoutedExact]] + filter at probe C/4 and C: the
  *     brute-force-within-probed-shards path — under a filter its cost
  *     SHRINKS with s (disallowed rows drop before scoring) while its
  *     recall stays routing-bound, so it is the natural low-selectivity
  *     engine; at probe C it IS the exact filtered top-k (gated ≥ 0.999).
  *
  * Reuses the index [[RefineDim512Proof]] saved (arg 1; default
  * `/tmp/graft_routed512_1m`) — no rebuild. Prints one JSON line,
  * committed as `BENCH_SCALE_FILTERED512.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.FilteredDim512Proof [indexDir]"
  */
object FilteredDim512Proof {
  def main(args: Array[String]): Unit = {
    val indexDir = args.headOption.getOrElse("/tmp/graft_routed512_1m")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-filtered-512-proof")
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

    val idx0 = Hnsw.load(spark, indexDir)
    val index = idx0.copy(
      nodes = idx0.nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      edges = idx0.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = index.meta.num_nodes
    val c = index.meta.num_cells
    index.edges.count()
    System.err.println(s"[filtered512] loaded $n x ${index.meta.dim}, " +
      s"P=${index.meta.num_partitions}, C=$c from $indexDir")

    val uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample = uniq.filter(col("id") % (n / 100) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = sample.count()
    val dist = graft.functions.Distances.metric(index.meta.metric)
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }

    val k = 10
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    for (selPct <- Seq(1, 10, 50)) {
      // deterministic predicate: id % 100 < selPct — queries are NOT
      // guaranteed allowed (the usual case: query text vs doc attributes)
      val allowed = uniq.filter(col("id") % 100 < selPct).select("id")
      val exact = graft.operators.Knn.exactTopK(
        uniq.join(allowed, "id"), sample, k, dist).localCheckpoint()
      def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
        Hnsw.recallAtK(ann, exact, k).agg(avg("recall")).head().getDouble(0)
      def point(method: String, ef: Int, probe: Int,
                ann: => org.apache.spark.sql.DataFrame): Double = {
        val (a, sec) = timed(ann.localCheckpoint())
        val r = recallOf(a)
        System.err.println(f"[filtered512] sel=$selPct%% $method ef=$ef probe=$probe: " +
          f"recall@$k $r%.4f ($sec%.1f s)")
        results += s"""{"selectivity_pct":$selPct,"method":"$method","ef":$ef,""" +
          s""""probe_cells":$probe,"recall10":$r,"sec":$sec}"""
        r
      }
      val efHigh = math.min(4096, 2 * k * 100 / selPct)
      point("traversal", 200, c,
        Hnsw.annQueryFiltered(index, sample, k, allowed, ef = 200,
          routed = true, probeCells = c))
      if (efHigh > 200)
        point("traversal", efHigh, c,
          Hnsw.annQueryFiltered(index, sample, k, allowed, ef = efHigh,
            routed = true, probeCells = c))
      point("exact_probed", -1, c / 4,
        Hnsw.annQueryRoutedExact(Hnsw.withAllowed(index, allowed), sample, k,
          probeCells = c / 4))
      val rFull = point("exact_probed", -1, c,
        Hnsw.annQueryRoutedExact(Hnsw.withAllowed(index, allowed), sample, k,
          probeCells = c))
      require(rFull >= 0.999,
        f"sel=$selPct%%: full-probe exact-filtered recall $rFull%.4f < 0.999")
      graft.operators.Checkpoints.unpersist(exact)
    }

    println(s"""{"n":$n,"dim":${index.meta.dim},"num_cells":$c,"recall_queries":$nQ,""" +
      s""""k":$k,"points":${results.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
