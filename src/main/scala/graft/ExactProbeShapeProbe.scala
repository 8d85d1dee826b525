package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.Hnsw

/** Diagnostic harness for the exact-probed SCORED-JOIN shape at the
  * flagship 5M × 512 point. Two measurement traps it exists to document
  * (both bit this round before it was written):
  *
  *   - `.count()` on an aggregate lets Catalyst PRUNE the aggregate
  *     function and everything only it consumes — a timed
  *     `scored.groupBy.agg(topk).count()` runs the join WITHOUT the
  *     distance projection and reads 5–10× too fast. Every variant here
  *     explodes the top-k column so the function (and the distances
  *     feeding it) must evaluate.
  *   - a corpus-wide groupBy before the timed call shuffles ~10 GB and
  *     can evict the cached node table (unified memory borrows storage),
  *     turning the "query" into a disk-read benchmark.
  *
  * Variants, all bit-equal results, min-of-3 each:
  *   a. current shape: nodes ⋈_pid broadcast(route) → distance → top-k
  *   b. BNLJ twin: pruned node scan crossJoin broadcast(route) with a
  *      pid equality FILTER (distance only on pid-matched survivors)
  *   c. exactTopK over the unpruned table (the brute-force oracle)
  *   d. the public annQueryRoutedExact API end-to-end
  *   e. the no-flag annQueryAdaptive call (decay branch)
  *
  * MEASURED CONCLUSION (5M×512, 100 uniform queries, warm, min-of-3):
  * hash-join 26.7 s ≈ BNLJ 27.1 s ≈ API 28.0 s ≈ adaptive 26.2 s ≈ FULL
  * brute force 29.0 s — every variant is bound by streaming the ~10 GB
  * node table (uniform queries probe all 64 pids, so nothing prunes the
  * scan), and the 4× distance-eval difference disappears under it. The
  * exact-probed path's real at-scale win is SHIPPING: on a cluster the
  * probed-shard semi-join prunes the scan itself to s/P of the corpus,
  * which a single-box all-pid probe cannot exhibit. Join shape is NOT a
  * lever here; no code change follows.
  *
  * Prints one JSON line with per-variant seconds. An engineering probe,
  * not a BENCH artifact generator — its conclusions live in the
  * exactProbedSearch scaladoc and the AdaptiveDim512Proof methodology.
  *
  *   SPARK_DRIVER_MEM=96g scripts/run_main.sh graft.ExactProbeShapeProbe /root/scale/idx512 200
  */
object ExactProbeShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/idx512")
    val nQ = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-exact-probe-shape")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx0 = Hnsw.load(spark, dir)
    val index = idx0.copy(nodes = idx0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = index.meta.num_nodes
    index.nodes.count() // materialize the cache before timing
    val sample = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .filter(col("id") % math.max(1L, n / nQ) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val q = sample.count()
    val distFn = graft.functions.Distances.metric(index.meta.metric)

    def timed(f: => Long): Double = {
      val s = System.nanoTime(); val r = f
      System.err.println(s"  rows=$r"); (System.nanoTime() - s) / 1e9
    }

    // shared probe phase (lazy)
    def route = {
      val probed = Hnsw.probedPidsFor(index, sample, -1)
      probed.join(sample.select(col("qid"), col("vector").as("q_vector")), "qid")
    }

    // consume the aggregate OUTPUT so the topk function (and the distance
    // projection feeding it) cannot be pruned away by count()'s column
    // pruning — the trap in the scaladoc
    def force(agged: org.apache.spark.sql.DataFrame): Long =
      agged.select(explode(col("top"))).count()

    // (a) current: pid hash join
    val aSec = (1 to 3).map(_ => timed {
      force(index.nodes.filter(!col("tombstone"))
        .select(col("pid").cast("int").as("pid"), col("id").cast("long").as("id"),
          col("vector").cast("array<float>").as("i_vector"))
        .join(broadcast(route), Seq("pid"))
        .select(col("qid"), col("id"), distFn(col("i_vector"), col("q_vector")).as("dist"))
        .groupBy(col("qid"))
        .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), 10).as("top")))
    }).min
    // (b) BNLJ twin: pair loop + pid filter, distance on survivors only
    val bSec = (1 to 3).map(_ => timed {
      val activePids = route.select("pid").distinct()
      force(index.nodes.join(broadcast(activePids), Seq("pid"), "left_semi")
        .filter(!col("tombstone"))
        .select(col("pid").cast("int").as("n_pid"), col("id").cast("long").as("id"),
          col("vector").cast("array<float>").as("i_vector"))
        .crossJoin(broadcast(route.withColumnRenamed("pid", "r_pid")))
        .filter(col("n_pid") === col("r_pid"))
        .select(col("qid"), col("id"), distFn(col("i_vector"), col("q_vector")).as("dist"))
        .groupBy(col("qid"))
        .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), 10).as("top")))
    }).min
    // (c) exactTopK over everything (the oracle; its output explodes top
    //     already — no pruning hazard)
    val cSec = (1 to 3).map(_ => timed {
      val uniq = index.nodes.filter(!col("tombstone"))
        .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      graft.operators.Knn.exactTopK(uniq, sample, 10, distFn).count()
    }).min
    // (d) the REAL public path end-to-end (probe re-derived inside,
    //     rankTopK posexplode) — isolates any gap vs the raw shape (a);
    //     3 reps each (this VM's 3-4x noise), min reported
    val dSec = (1 to 3).map(_ => timed {
      Hnsw.annQueryRoutedExact(index, sample, 10).count()
    }).min
    // (e) the REAL adaptive no-flag call (decay branch: probe checkpoint
    //     + count + the exact-probed plan)
    val eSec = (1 to 3).map(_ => timed {
      Hnsw.annQueryAdaptive(index, sample, 10).count()
    }).min
    println(s"""{"n":$n,"queries":$q,"hash_join_sec":$aSec,""" +
      s""""bnlj_filter_sec":$bSec,"exact_full_sec":$cSec,""" +
      s""""routed_exact_api_sec":$dSec,"adaptive_api_sec":$eSec}""")
    if (sys.env.contains("SHAPE_EXPLAIN")) {
      val aDf = index.nodes.filter(!col("tombstone"))
        .select(col("pid").cast("int").as("pid"), col("id").cast("long").as("id"),
          col("vector").cast("array<float>").as("i_vector"))
        .join(broadcast(route), Seq("pid"))
        .select(col("qid"), col("id"), distFn(col("i_vector"), col("q_vector")).as("dist"))
        .groupBy(col("qid"))
        .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), 10).as("top"))
      System.err.println("=== RAW (a) ===")
      System.err.println(aDf.queryExecution.executedPlan.toString)
      System.err.println("=== API (d) ===")
      System.err.println(Hnsw.annQueryRoutedExact(index, sample, 10)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
