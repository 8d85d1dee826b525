package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}

/** Scale evidence for the ROUTED build at the flagship dimensionality:
  * 5M × dim-512 cosine — the reference's CIFAR-class config (512-d
  * embeddings) at --prepare-sized corpus scale. The 64-dim proofs
  * (ScaleProof / RoutedProof) pin graph quality and probe-cost scaling;
  * this pins that the locality-sharded build and the routed/adaptive
  * query paths hold when every distance costs 8× more:
  *
  *   - buildRouted end-to-end (k-means cells → locality shards → spill
  *     ghosts → per-shard graphs → save-shaped materialization);
  *   - a clustered 25-query batch through routed vs all-shard vs
  *     adaptive (the probe-pruning win must survive the dim);
  *   - recall@10 vs the exact oracle on sampled queries at a PROBE
  *     SWEEP (C/4, C/2, C) plus the all-shard path. Gates: recall is
  *     monotone in the probe budget, and the full-probe point matches
  *     all-shard (≥ 0.95× — structurally it searches every cell).
  *     The C/4 and C/2 RATIOS are reported, not gated: on uniform
  *     random 512-dim vectors distances concentrate, so a fixed probe
  *     budget captures a structurally lower share of the true top-k
  *     than at dim 64 (measured ~0.84× at C/4) — the standard IVF
  *     recall/probe dial, which real (clusterable) embedding corpora
  *     sit far above.
  *
  * Build params are the scale-grid settings (m = 12, efc = 100 — the
  * RoutedProof/ScaleProof grid; the matched-baseline M=16/efc=200
  * throughput is measured per-round by Bench at the reference's own
  * 5k-vector size). Prints one JSON line, committed as
  * `BENCH_SCALE_ROUTED512.json`. Run:
  *
  *   SPARK_DRIVER_MEM=96g sbt "runMain graft.RoutedDim512Proof [n] [dim]"
  *
  * Disk-bounded 5M recipe (each JVM's shuffle files are freed on exit):
  *   run_main.sh graft.RoutedDim512Proof 5000000 512 /tmp/idx512 build none
  *   run_main.sh graft.RoutedDim512Proof 5000000 512 /tmp/idx512 load probe:64,probe:128
  *   run_main.sh graft.RoutedDim512Proof 5000000 512 /tmp/idx512 load probe:256,allshard
  */
object RoutedDim512Proof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(512)
    // arg 3: index save dir ("" disables); arg 4: "load" resumes the
    // query/recall phases from a previously-saved build at that dir —
    // the 5M x 512 lesson: the build (~80 min) completed twice while the
    // probe-256 recall stage hit disk limits, so the expensive phase
    // must be restartable without rebuilding
    val saveDir = args.lift(2).getOrElse("")
    val resume = args.lift(3).contains("load")
    // arg 5: comma-separated phase list — tokens "clustered", "probe:<pc>",
    // "allshard", or "none" (build+save only). Default: every phase. The
    // 5M x 512 lesson, part 2: this VM exposes only ~79 GiB of usable disk
    // (ext4 resv_strict reserves the rest), and each query phase shuffles
    // the full node+edge tables (~12 GiB at 5M x 512); running all five
    // phases in one JVM accumulates shuffle files past the limit even with
    // periodic GC. One-or-two phases per JVM, resumed from the saved
    // index, stays comfortably inside it — each JVM exit frees its spill.
    val phaseArg = args.lift(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-routed-512-proof")
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
    import spark.implicits._

    val p = 64
    val params = HnswParams(dim = dim, m = 12, efConstruction = 100,
      metric = "cosine", numPartitions = p)
    val input = graft.sources.Datagen.hashVectors(spark, n, dim)
    val t0 = System.nanoTime()
    val idx0 = if (resume) Hnsw.load(spark, saveDir) else Hnsw.buildRouted(input, params)
    val index = idx0.copy(nodes = idx0.nodes.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      edges = idx0.edges.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val built = index.meta.num_nodes
    index.edges.count()
    val buildSecs = (System.nanoTime() - t0) / 1e9
    if (!resume && saveDir.nonEmpty) {
      Hnsw.save(index, saveDir)
      System.err.println(s"[routed512] index saved to $saveDir")
    }
    val c = index.meta.num_cells
    require(built == n, s"routed build indexed $built of $n distinct vectors")
    System.err.println(f"[routed512] build $n x $dim, P=$p, C=$c " +
      f"in $buildSecs%.1f s (${n / buildSecs}%.1f vec/s)")

    val (doClustered, probes, doAllShard) = phaseArg match {
      case None => (true, Seq(c / 4, c / 2, c), true)
      case Some(s) =>
        val toks = s.split(",").map(_.trim).filter(_.nonEmpty)
        (toks.contains("clustered"),
          toks.collect { case t if t.startsWith("probe:") =>
            t.stripPrefix("probe:").toInt }.toSeq.sorted,
          toks.contains("allshard"))
    }
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }

    // ---- clustered query batch: routed vs all-shard vs adaptive ----
    val clustered = if (!doClustered) None else {
      val center = input.filter(col("id") === 17L).head().getSeq[Float](1).toArray
      val qs = (0 until 25).map { i =>
        (100000L + i, center.zipWithIndex.map { case (v, j) =>
          v + (if (j == i % dim) 0.05f else 0.0f) })
      }.toDF("qid", "vector").localCheckpoint()
      val (_, routedSec) = timed(Hnsw.annQueryRouted(index, qs, 10, ef = 200).count())
      val (_, allSec) = timed(Hnsw.annQuery(index, qs, 10, ef = 200).count())
      val (_, adaptSec) = timed(Hnsw.annQueryAdaptive(index, qs, 10, ef = 200).count())
      System.err.println(f"[routed512] clustered 25q: routed $routedSec%.1f s, " +
        f"all-shard $allSec%.1f s, adaptive $adaptSec%.1f s")
      Some((routedSec, allSec, adaptSec))
    }

    // ---- recall gate: routed probe vs exact on sampled queries ----
    val recall = if (probes.isEmpty && !doAllShard) None else {
      val uniq = index.nodes.filter(!col("tombstone"))
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      val nRecallQ = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "100").toLong
      val sample = uniq.filter(col("id") % (n / nRecallQ) === 0)
        .select(col("id").as("qid"), col("vector")).localCheckpoint()
      val nQ = sample.count()
      val dist = graft.functions.Distances.metric(index.meta.metric)
      val exact = graft.operators.Knn.exactTopK(uniq, sample, 10, dist).localCheckpoint()
      def recallAt(pc: Int): (Double, Double) = {
        val (ann, sec) = timed(
          Hnsw.annQueryRouted(index, sample, 10, probeCells = pc, ef = 200)
            .localCheckpoint())
        (Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0), sec)
      }
      val sweep = probes.map { pc =>
        val (r, sec) = recallAt(pc)
        System.err.println(f"[routed512] probe $pc/$c cells: recall@10 $r%.4f ($sec%.1f s)")
        (pc, r, sec)
      }
      val allShard = if (!doAllShard) None else {
        val (annAll, annAllSec) = timed(
          Hnsw.annQuery(index, sample, 10, ef = 200).localCheckpoint())
        val recallAll = Hnsw.recallAtK(annAll, exact, 10)
          .agg(avg("recall")).head().getDouble(0)
        System.err.println(f"[routed512] all-shard recall@10 $recallAll%.4f " +
          f"over $nQ queries ($annAllSec%.1f s)")
        Some((recallAll, annAllSec))
      }
      // gates: the dial must be monotone, and full probe must match the
      // all-shard coverage it is structurally equivalent to
      sweep.sliding(2).foreach {
        case Seq((pcA, rA, _), (pcB, rB, _)) =>
          require(rB >= rA - 1e-9, f"recall fell from $rA%.4f ($pcA cells) to $rB%.4f ($pcB)")
        case _ => ()
      }
      for ((recallAll, _) <- allShard; last <- sweep.lastOption if last._1 >= c)
        require(last._2 >= 0.95 * recallAll,
          f"full-probe recall ${last._2}%.4f below 0.95x all-shard $recallAll%.4f")
      Some((sweep, allShard, nQ))
    }

    val clusteredJson = clustered.map { case (routedSec, allSec, adaptSec) =>
      s""""clustered_routed_sec":$routedSec,"clustered_allshard_sec":$allSec,""" +
        s""""clustered_adaptive_sec":$adaptSec,""" }.getOrElse("")
    val recallJson = recall.map { case (sweep, allShard, nQ) =>
      val sweepJson = sweep.map { case (pc, r, sec) =>
        s"""{"probe_cells":$pc,"recall10":$r,"sec":$sec}""" }.mkString("[", ",", "]")
      s""""recall_sweep_ef200":$sweepJson,""" +
        allShard.map { case (recallAll, annAllSec) =>
          s""""recall10_allshard_ef200":$recallAll,""" +
            s""""recall_allshard_sec":$annAllSec,""" }.getOrElse("") +
        s""""recall_queries":$nQ,""" }.getOrElse("")
    // on resume, buildSecs is the index LOAD time, not a build — flag it
    println(s"""{"n":$n,"dim":$dim,"num_partitions":$p,"num_cells":$c,""" +
      (if (resume) s""""resumed_from":"$saveDir","index_load_sec":$buildSecs,"""
       else s""""routed_build_sec":$buildSecs,"build_vec_per_sec":${n / buildSecs},""") +
      clusteredJson + recallJson +
      s""""phases":"${phaseArg.getOrElse("all")}"}""")
    spark.stop()
  }
}
