package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}

/** Streaming ingest ladder at scale: ~1M vectors arriving as ~100
  * micro-batches through [[graft.streaming.StreamingOps.appendBatchRouted]]
  * (the exact kernel `incrementalAddRouted`'s foreachBatch invokes —
  * StreamingSpec pins the writer plumbing at toy size; this pins the
  * MECHANICS at scale), then [[Hnsw.compactRouted]], then routed queries.
  * What it proves:
  *
  *   - 100 appended pid blocks accumulate without losing reachability:
  *     the pre-compaction routed query still finds planted neighbours
  *     (recall measured, not assumed) across ~100·P shards;
  *   - compaction folds every appended shard back to its home pid
  *     (shard count collapses to P), restores the exact num_nodes count,
  *     and REPAIRS recall (per-batch islands become real in-graph links)
  *     — gate: post-compaction recall ≥ pre (query times reported, not
  *     gated — micro-batch islands vs merged shards trade rebuild and
  *     search cost differently at different scales);
  *   - per-batch append cost stays O(batch): the slowest append is
  *     reported and must not grow with the batch index (no O(n) rescan
  *     creep) — gated at last-10-mean ≤ 3× first-10-mean.
  *
  * Prints one JSON line, committed as `BENCH_SCALE_STREAMING.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.StreamingIngestScaleProof [n] [batches] [dim]"
  */
object StreamingIngestScaleProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(100)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-streaming-ingest-proof")
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

    val p = 32
    val params = HnswParams(dim = dim, m = 12, efConstruction = 100,
      metric = "cosine", numPartitions = p)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ingest").toString
    val all = graft.sources.Datagen.hashVectors(spark, n, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    all.count()
    val per = n / nBatches
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }

    // ---- batch 0 bootstraps the routed geometry; 1..B-1 append ----
    val batchSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val (_, bootSec) = timed {
      // autoCalibrate = false: this save is inside the TIMED ingest
      // measurement and the curve would be invalidated by the very first
      // append anyway (ADVICE r14 — don't pay a calibration nobody
      // consumes, don't skew bootstrap_sec)
      Hnsw.save(Hnsw.buildRouted(all.filter(col("id") < per), params), dir,
        autoCalibrate = false)
    }
    System.err.println(f"[stream-ingest] bootstrap $per vectors in $bootSec%.1f s -> $dir")
    val t0 = System.nanoTime()
    for (b <- 1 until nBatches) {
      val batch = all.filter(col("id") >= b * per &&
        col("id") < (if (b == nBatches - 1) n else (b + 1) * per))
      val (_, sec) = timed {
        graft.streaming.StreamingOps.appendBatchRouted(batch, dir, params, batchId = b.toLong)
      }
      batchSecs += sec
      if (b % 20 == 0) System.err.println(f"[stream-ingest] batch $b: $sec%.2f s")
    }
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val firstMean = batchSecs.take(10).sum / 10
    val lastMean = batchSecs.takeRight(10).sum / 10
    System.err.println(f"[stream-ingest] ${nBatches - 1} appends in $ingestSec%.1f s " +
      f"(first-10 mean $firstMean%.2f s, last-10 mean $lastMean%.2f s, " +
      f"max ${batchSecs.max}%.2f s)")
    require(lastMean <= 3 * firstMean,
      f"append cost grew from $firstMean%.2f s to $lastMean%.2f s — O(n) rescan creep")

    // ---- pre-compaction state + recall ----
    val pre0 = Hnsw.load(spark, dir)
    val pre = pre0.copy(nodes = pre0.nodes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val preShards = pre.nodes.select("pid").distinct().count()
    val uniq = pre.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    require(uniq.count() == n, s"appended index must hold all $n distinct ids")
    val sample = uniq.filter(col("id") % (n / 100) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val dist = graft.functions.Distances.metric(params.metric)
    val exact = graft.operators.Knn.exactTopK(uniq, sample, 10, dist).localCheckpoint()
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
      Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
    val (preAnn, preQuerySec) = timed(
      Hnsw.annQueryRouted(pre, sample, 10, ef = 200).localCheckpoint())
    val preRecall = recallOf(preAnn)
    System.err.println(f"[stream-ingest] pre-compaction: $preShards shards, " +
      f"recall@10 $preRecall%.4f ($preQuerySec%.1f s)")

    // ---- compaction: fold appended shards to home pids, rebuild ----
    val (compacted0, compactSec) = timed {
      val c = Hnsw.compactRouted(pre, params)
      // persist BOTH tables: the compacted edges are a lazy plan over the
      // whole per-shard rebuild — unpersisted, every later query would
      // silently re-run the compaction and time it as query cost
      val cc = c.copy(
        nodes = c.nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        edges = c.edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      cc.edges.count()
      cc.nodes.count()
      cc
    }
    val postShards = compacted0.nodes.select("pid").distinct().count()
    require(postShards == p.toLong, s"compaction must fold to $p shards, got $postShards")
    require(compacted0.meta.num_nodes == n,
      s"compaction must restore the exact count: ${compacted0.meta.num_nodes} != $n")
    val (postAnn, postQuerySec) = timed(
      Hnsw.annQueryRouted(compacted0, sample, 10, ef = 200).localCheckpoint())
    val postRecall = recallOf(postAnn)
    System.err.println(f"[stream-ingest] post-compaction: $postShards shards in " +
      f"$compactSec%.1f s, recall@10 $postRecall%.4f ($postQuerySec%.1f s)")
    require(postRecall >= preRecall - 0.02,
      f"compaction lost recall: $preRecall%.4f -> $postRecall%.4f")

    println(s"""{"n":$n,"dim":$dim,"batches":$nBatches,"num_partitions":$p,""" +
      s""""bootstrap_sec":$bootSec,"ingest_sec":$ingestSec,""" +
      s""""append_first10_mean_sec":$firstMean,"append_last10_mean_sec":$lastMean,""" +
      s""""append_max_sec":${batchSecs.max},""" +
      s""""pre_shards":$preShards,"pre_recall10":$preRecall,"pre_query_sec":$preQuerySec,""" +
      s""""compact_sec":$compactSec,"post_shards":$postShards,""" +
      s""""post_recall10":$postRecall,"post_query_sec":$postQuerySec,""" +
      s""""recall_queries":${sample.count()}}""")
    spark.stop()
  }
}
