package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}

/** The dim-512 RECALL flagship: where on the (ef, refine, probe) surface
  * does the routed index reach recall@10 ≥ 0.9 at 1M × 512, and at what
  * cost? BENCH_SCALE_ROUTED512.json pinned the r9 ceiling — recall@10
  * 0.665 at ef=200 even at full probe, i.e. all-shard parity: the limit
  * is per-shard TRAVERSAL quality at high dim, not routing. This proof
  * measures the three levers that move it:
  *
  *   - ef sweep past 200 (200 → 1600): deeper traversal, cost ~linear
  *     in ef;
  *   - [[Hnsw.annQueryRoutedRefined]]: one-hop graph expansion + exact
  *     rescore over the coarse top-R — widens the candidate set by
  *     R·degree for the cost of O(q·R·deg) exact distances;
  *   - [[Hnsw.annQueryRoutedExact]]: brute force within probed shards —
  *     recall = routing recall by construction (1.0 at full probe), the
  *     guaranteed ceiling and its cost.
  *
  * Gates: recall monotone in ef; exact-probed full-probe ≥ 0.999; at
  * least one measured point ≥ 0.9 recall@10. The cheapest such point is
  * reported as `operating_point`. The built index is ALSO saved to
  * `saveDir` (arg 3) so the filtered-selectivity proof reuses it without
  * a second 20-minute build. Prints one JSON line, committed as
  * `BENCH_SCALE_REFINE512.json`. Run:
  *
  *   SPARK_DRIVER_MEM=96g sbt "runMain graft.RefineDim512Proof [n] [dim] [saveDir]"
  */
object RefineDim512Proof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(512)
    val saveDir = args.lift(2).getOrElse("/tmp/graft_routed512_1m")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-refine-512-proof")
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

    val p = 64
    val params = HnswParams(dim = dim, m = 12, efConstruction = 100,
      metric = "cosine", numPartitions = p)
    val input = graft.sources.Datagen.hashVectors(spark, n, dim)
    val t0 = System.nanoTime()
    val idx0 = Hnsw.buildRouted(input, params)
    val index = idx0.copy(
      nodes = idx0.nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      edges = idx0.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    index.edges.count()
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val c = index.meta.num_cells
    require(index.meta.num_nodes == n, s"indexed ${index.meta.num_nodes} of $n")
    System.err.println(f"[refine512] build $n x $dim, P=$p, C=$c in $buildSecs%.1f s " +
      f"(${n / buildSecs}%.1f vec/s)")
    Hnsw.save(index, saveDir)
    System.err.println(s"[refine512] index saved to $saveDir")

    val uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
    val sample = uniq.filter(col("id") % (n / 100) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = sample.count()
    val dist = graft.functions.Distances.metric(index.meta.metric)
    val exact = graft.operators.Knn.exactTopK(uniq, sample, 10, dist).localCheckpoint()
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
      Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)

    final case class Point(kind: String, ef: Int, refine: Int, hops: Int,
                           probe: Int, recall: Double, sec: Double) {
      def json: String =
        s"""{"kind":"$kind","ef":$ef,"refine":$refine,"hops":$hops,""" +
          s""""probe_cells":$probe,"recall10":$recall,"sec":$sec}"""
    }
    val points = scala.collection.mutable.ArrayBuffer.empty[Point]

    // ---- lever 1: ef sweep at full probe (the r9 ceiling extended) ----
    val efSweep = Seq(200, 400, 800, 1600).map { ef =>
      val (ann, sec) = timed(
        Hnsw.annQueryRouted(index, sample, 10, probeCells = c, ef = ef).localCheckpoint())
      val r = recallOf(ann)
      System.err.println(f"[refine512] traversal ef=$ef: recall@10 $r%.4f ($sec%.1f s)")
      points += Point("traversal", ef, -1, 0, c, r, sec)
      (ef, r)
    }
    efSweep.sliding(2).foreach {
      case Seq((efA, rA), (efB, rB)) =>
        require(rB >= rA - 0.02, f"recall fell from $rA%.4f (ef=$efA) to $rB%.4f (ef=$efB)")
      case _ => ()
    }

    // ---- lever 2: refine (expansion + exact rescore) ----
    for ((ef, rr, hops) <- Seq((200, 100, 1), (200, 400, 1), (400, 400, 1), (200, 100, 2))) {
      val (ann, sec) = timed(
        Hnsw.annQueryRoutedRefined(index, sample, 10, probeCells = c, ef = ef,
          refine = rr, expandHops = hops).localCheckpoint())
      val r = recallOf(ann)
      System.err.println(f"[refine512] refined ef=$ef R=$rr hops=$hops: " +
        f"recall@10 $r%.4f ($sec%.1f s)")
      points += Point("refined", ef, rr, hops, c, r, sec)
    }

    // ---- lever 3: exact within probed shards (routing-recall ceiling) ----
    for (pc <- Seq(c / 4, c / 2, c)) {
      val (ann, sec) = timed(
        Hnsw.annQueryRoutedExact(index, sample, 10, probeCells = pc).localCheckpoint())
      val r = recallOf(ann)
      System.err.println(f"[refine512] exact-probed $pc/$c cells: recall@10 $r%.4f ($sec%.1f s)")
      points += Point("exact_probed", -1, -1, 0, pc, r, sec)
    }
    val exactFull = points.last
    require(exactFull.recall >= 0.999,
      f"full-probe exact recall ${exactFull.recall}%.4f < 0.999 — brute force must be exact")

    val ok = points.filter(_.recall >= 0.9)
    require(ok.nonEmpty, "no measured point reached recall@10 >= 0.9")
    val op = ok.minBy(_.sec)
    System.err.println(f"[refine512] operating point: ${op.json} " +
      f"(vs exact full-probe ${exactFull.sec}%.1f s)")

    println(s"""{"n":$n,"dim":$dim,"num_partitions":$p,"num_cells":$c,""" +
      s""""routed_build_sec":$buildSecs,"build_vec_per_sec":${n / buildSecs},""" +
      s""""recall_queries":$nQ,"points":${points.map(_.json).mkString("[", ",", "]")},""" +
      s""""operating_point":${op.json},"index_dir":"$saveDir"}""")
    spark.stop()
  }
}
