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
  *   - recall@10 of the routed probe AND the all-shard ANN path vs the
  *     exact oracle on sampled queries. The gate is RELATIVE: routed ≥
  *     0.9× all-shard (the RoutedProof/ScaleProof property — probe
  *     pruning must not cost recall). Absolute recall is reported, not
  *     gated: uniform random 512-dim vectors concentrate distances
  *     (near-equidistant neighbors), so absolute ANN recall at ef = 200
  *     is structurally lower than at dim 64 for EVERY graph method —
  *     real embedding corpora are far more clusterable.
  *
  * Build params are the scale-grid settings (m = 12, efc = 100 — the
  * RoutedProof/ScaleProof grid; the matched-baseline M=16/efc=200
  * throughput is measured per-round by Bench at the reference's own
  * 5k-vector size). Prints one JSON line, committed as
  * `BENCH_SCALE_ROUTED512.json`. Run:
  *
  *   SPARK_DRIVER_MEM=96g sbt "runMain graft.RoutedDim512Proof [n] [dim]"
  */
object RoutedDim512Proof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-routed-512-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
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
    val idx0 = Hnsw.buildRouted(input, params)
    val index = idx0.copy(nodes = idx0.nodes.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      edges = idx0.edges.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val built = index.meta.num_nodes
    index.edges.count()
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val c = index.meta.num_cells
    require(built == n, s"routed build indexed $built of $n distinct vectors")
    System.err.println(f"[routed512] build $n x $dim, P=$p, C=$c " +
      f"in $buildSecs%.1f s (${n / buildSecs}%.1f vec/s)")

    // ---- clustered query batch: routed vs all-shard vs adaptive ----
    val center = input.filter(col("id") === 17L).head().getSeq[Float](1).toArray
    val qs = (0 until 25).map { i =>
      (100000L + i, center.zipWithIndex.map { case (v, j) =>
        v + (if (j == i % dim) 0.05f else 0.0f) })
    }.toDF("qid", "vector").localCheckpoint()
    def timed[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f; (r, (System.nanoTime() - s) / 1e9)
    }
    val (_, routedSec) = timed(Hnsw.annQueryRouted(index, qs, 10, ef = 200).count())
    val (_, allSec) = timed(Hnsw.annQuery(index, qs, 10, ef = 200).count())
    val (_, adaptSec) = timed(Hnsw.annQueryAdaptive(index, qs, 10, ef = 200).count())
    System.err.println(f"[routed512] clustered 25q: routed $routedSec%.1f s, " +
      f"all-shard $allSec%.1f s, adaptive $adaptSec%.1f s")

    // ---- recall gate: routed probe vs exact on sampled queries ----
    val uniq = index.nodes.filter(!col("tombstone"))
      .groupBy(col("id")).agg(first(col("vector")).as("vector"))
    val sample = uniq.filter(col("id") % (n / 100) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = sample.count()
    val dist = graft.functions.Distances.metric(index.meta.metric)
    val exact = graft.operators.Knn.exactTopK(uniq, sample, 10, dist).localCheckpoint()
    val (ann, annSec) = timed(
      Hnsw.annQueryRouted(index, sample, 10, ef = 200).localCheckpoint())
    val recall = Hnsw.recallAtK(ann, exact, 10)
      .agg(avg("recall")).head().getDouble(0)
    val (annAll, annAllSec) = timed(
      Hnsw.annQuery(index, sample, 10, ef = 200).localCheckpoint())
    val recallAll = Hnsw.recallAtK(annAll, exact, 10)
      .agg(avg("recall")).head().getDouble(0)
    System.err.println(f"[routed512] recall@10 routed $recall%.4f vs all-shard " +
      f"$recallAll%.4f over $nQ queries (routed $annSec%.1f s, all $annAllSec%.1f s)")
    require(recall >= 0.9 * recallAll,
      f"routed recall@10 $recall%.4f below 0.9x the all-shard $recallAll%.4f")

    println(s"""{"n":$n,"dim":$dim,"num_partitions":$p,"num_cells":$c,""" +
      s""""routed_build_sec":$buildSecs,"build_vec_per_sec":${n / buildSecs},""" +
      s""""clustered_routed_sec":$routedSec,"clustered_allshard_sec":$allSec,""" +
      s""""clustered_adaptive_sec":$adaptSec,""" +
      s""""recall10_routed_ef200":$recall,"recall10_allshard_ef200":$recallAll,""" +
      s""""recall_queries":$nQ,"recall_routed_sec":$annSec,"recall_allshard_sec":$annAllSec}""")
    spark.stop()
  }
}
