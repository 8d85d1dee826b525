package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.hnsw.{Hnsw, HnswParams}
import graft.operators.{Dedup, Knn}
import graft.sources.Datagen

/** One-order-of-magnitude scale proof (VERDICT r02 #6): every 100 TB claim
  * in the README extrapolates from sf0.1 — this main runs the same
  * operators at 10× the largest committed bench point (5M×64 vs the 500k
  * README row) and prints one JSON line with wall times, committed as
  * `BENCH_SCALE.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.ScaleProof [n]"
  *
  * Phases: distributed HNSW build (M=12, efc=100, 32 partitions — the
  * 500k row's config), recall\@10 eval at ef=50/ef=200 vs the exact
  * brute-force oracle, the driver-free [[Hnsw.annQueryLarge]] path, and
  * the label-free embedding near-dup pass with the bucket width the
  * sizing rule prescribes at this n (bits=16 → expected block ≈ n/2^16).
  * 1% of ids get a planted near-duplicate (id + n) so the near-dup pass
  * has real positives to find.
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-proof")
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
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale_idx")
    val params = HnswParams(dim = dim, m = 12, efConstruction = 100, numPartitions = 32)
    val input = Datagen.gaussianVectors(spark, n, dim)

    // ---- phase 1: build + persist (the 500k README row's config, 10×) ----
    val (_, buildSecs) = timed {
      Hnsw.save(Hnsw.build(input, params), out)
    }
    System.err.println(f"[scale] build $n%d x $dim in $buildSecs%.1f s (${n / buildSecs}%.0f vec/s)")

    val index = {
      val idx = Hnsw.load(spark, out)
      idx.copy(edges = idx.edges.cache(), nodes = idx.nodes.cache())
    }
    // 250 sampled queries: the exact brute-force oracle is O(n·q) and
    // dominates wall time at 5M — 250 keeps the recall estimate within
    // ±~2% while keeping the oracle phase near the build's cost
    val sampleMod = math.max(1L, n / 250L)
    val queries = index.nodes.filter(col("id") % sampleMod === 0)
      .select(col("id").as("qid"), col("vector"))

    // ---- phase 2: exact oracle (the brute-force baseline ANN must beat) ----
    val (exact, exactSecs) = timed {
      Knn.exactTopK(index.nodes.select("id", "vector"), queries, 10, Distances.l2)
        .localCheckpoint()
    }

    // ---- phase 3: ANN recall sweep — ef must scale with sub-graph size,
    // so the sweep includes the large-ef point the annQuery scaladoc cites
    def recallAt(ef: Int): (Double, Double) = {
      val (ann, annSecs) = timed(Hnsw.annQuery(index, queries, 10, ef).localCheckpoint())
      (Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0), annSecs)
    }
    val (recall50, ann50Secs) = recallAt(50)
    val (recall200, ann200Secs) = recallAt(200)
    val (recall800, ann800Secs) = recallAt(800)
    System.err.println(f"[scale] recall@10 ef50=$recall50%.3f (${ann50Secs}%.1f s) " +
      f"ef200=$recall200%.3f (${ann200Secs}%.1f s) ef800=$recall800%.3f (${ann800Secs}%.1f s) " +
      f"exact=${exactSecs}%.1f s")

    // ---- phase 3b: the DEFAULT budget (auto-ef from sub-graph size) must
    // deliver >=0.9 recall with no manual ef — the footgun the r4 verdict
    // flagged (defaults used to mean ef_search=50 → 0.556 here) ----
    val autoEf = Hnsw.efBudget(index.meta, 10, -1)
    val (recallAuto, annAutoSecs) = recallAt(-1)
    System.err.println(f"[scale] recall@10 DEFAULT(auto ef=$autoEf) = $recallAuto%.3f (${annAutoSecs}%.1f s)")

    // ---- phase 4: driver-free distributed query path at the same scale ----
    val (largeCount, largeSecs) = timed(Hnsw.annQueryLarge(index, queries, 10).count())

    // ---- phase 4r: centroid-routed shard pruning — the sublinear-in-P
    // query path. Locality-sharded build (k-means cells + FFD pack + spill
    // assignment), then the same query set through (a) the all-shard
    // search over the routed index and (b) the routed probe of the nearest
    // quarter of the cells. The routed point must keep >=0.9x the
    // all-shard recall while searching ~P/4 shards per query — the cost
    // model that survives P in the thousands ----
    val (routedIdxRaw, routedBuildSecs) = timed {
      val idx = Hnsw.buildRouted(input, params)
      idx.edges.cache().count()
      idx
    }
    val routedIdx = routedIdxRaw
    val (allOnRoutedRecall, allOnRoutedSecs) = {
      val (ann, secs) = timed(Hnsw.annQueryLarge(routedIdx, queries, 10).localCheckpoint())
      (Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0), secs)
    }
    val (routedRecall, routedSecs) = {
      val (ann, secs) = timed(Hnsw.annQueryRouted(routedIdx, queries, 10).localCheckpoint())
      (Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0), secs)
    }
    val routedCells = routedIdx.meta.num_cells
    System.err.println(f"[scale] routed build ${routedBuildSecs}%.1f s; all-shard-on-routed " +
      f"recall=$allOnRoutedRecall%.3f (${allOnRoutedSecs}%.1f s); routed probe C/4 " +
      f"recall=$routedRecall%.3f (${routedSecs}%.1f s, ratio ${routedRecall / math.max(allOnRoutedRecall, 1e-9)}%.3f)")

    // ---- phase 4a: the regime chooser on the SAME uniform query set —
    // this batch probes cells across every shard (the shape where r5's
    // always-routed path lost 24% wall time to all-shard), so
    // annQueryAdaptive must detect union → P and take the all-shard plan:
    // adaptive_sec ≈ allshard_on_routed_sec + the probe-phase cost ----
    val (adaptRecall, adaptSecs) = {
      val (ann, secs) = timed(Hnsw.annQueryAdaptive(routedIdx, queries, 10).localCheckpoint())
      (Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0), secs)
    }
    System.err.println(f"[scale] adaptive on uniform batch: recall=$adaptRecall%.3f " +
      f"(${adaptSecs}%.1f s vs always-routed ${routedSecs}%.1f s / all-shard ${allOnRoutedSecs}%.1f s)")

    // ---- phase 4b: filtered ANN at the same scale — 1/3 selectivity
    // (id % 3 = 0), ef widened ~3× per the k/selectivity budget; recall is
    // measured against the exact top-k over the pre-filtered corpus ----
    val allowed = index.nodes.filter(col("id") % 3 === 0).select("id")
    val (filteredRecall, filteredSecs) = timed {
      val ann = Hnsw.annQueryFiltered(index, queries, 10, allowed, ef = 600)
        .localCheckpoint()
      val exactF = Knn.exactTopK(
        index.nodes.filter(col("id") % 3 === 0).select("id", "vector"), queries, 10, Distances.l2)
        .localCheckpoint()
      Hnsw.recallAtK(ann, exactF, 10).agg(avg("recall")).head().getDouble(0)
    }
    System.err.println(f"[scale] filtered ANN (sel=1/3, ef=600): recall@10 $filteredRecall%.3f in $filteredSecs%.1f s (incl. exact oracle)")

    // ---- phase 5: label-free near-dup at the prescribed bucket width ----
    // 1% planted near-duplicates (id ≥ n marks a perturbed copy of id − n)
    val planted = input.filter(col("id") % 100 === 0)
      .select((col("id") + n).as("id"),
        transform(col("vector"), x => (x + lit(0.001f)).cast("float")).as("vector"))
    val corpus = input.union(planted)
      .withColumn("bucket", Dedup.embeddingBucket(col("vector"), dim, bits = 16))
    val ((pairs, found), dupSecs) = timed {
      val p = Dedup.embeddingNearDupPairs(corpus, "id", "vector", "bucket", maxDist = 0.05)
        .localCheckpoint()
      (p.count(), p.filter(col("id_b") - col("id_a") === n).count())
    }
    val expectedPlanted = (n + 99) / 100
    System.err.println(f"[scale] neardup bits=16: $pairs pairs ($found/$expectedPlanted planted found) in $dupSecs%.1f s")

    val line = s"""{"n":$n,"dim":$dim,"build_sec":$buildSecs,"build_vec_per_sec":${n / buildSecs},""" +
      s""""exact_topk_sec":$exactSecs,"ann_ef50_sec":$ann50Secs,"recall10_ef50":$recall50,""" +
      s""""ann_ef200_sec":$ann200Secs,"recall10_ef200":$recall200,""" +
      s""""ann_ef800_sec":$ann800Secs,"recall10_ef800":$recall800,""" +
      s""""ann_auto_ef":$autoEf,"ann_auto_sec":$annAutoSecs,"recall10_auto":$recallAuto,""" +
      s""""ann_query_large_sec":$largeSecs,"ann_query_large_rows":$largeCount,""" +
      s""""routed_build_sec":$routedBuildSecs,"routed_cells":$routedCells,""" +
      s""""allshard_on_routed_sec":$allOnRoutedSecs,"recall10_allshard_on_routed":$allOnRoutedRecall,""" +
      s""""routed_query_sec":$routedSecs,"recall10_routed":$routedRecall,""" +
      s""""adaptive_query_sec":$adaptSecs,"recall10_adaptive":$adaptRecall,""" +
      s""""filtered_ann_sec":$filteredSecs,"recall10_filtered_ef600":$filteredRecall,""" +
      s""""neardup_bits16_sec":$dupSecs,"neardup_pairs":$pairs,"planted_found":$found,"planted_total":$expectedPlanted}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_SCALE_LATEST.json")), line + "\n")
    catch { case e: Throwable => System.err.println(s"[scale] could not write artifact: $e") }
    spark.stop()
  }
}
