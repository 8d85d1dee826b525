package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}
import graft.operators.Knn

/** The MATCHED-SHAPE Fashion-MNIST scale point: BASELINE.md's second row
  * (`FashionMNIST_Vector_Search_HSNW.ipynb:731-736`) builds 60,000 × 784
  * (28×28 ubyte images), L2, M = 16, ef_construction = 200 — the one
  * reference configuration without a committed twin at its exact shape
  * (the 1M–5M × 512 proofs dominate it in difficulty but not in SHAPE).
  * This pins it end-to-end through the reference's own front door:
  *
  *   1. synthesize 60k MNIST-statistics images (smooth Gaussian blobs —
  *      low intrinsic dimension, like strokes; deterministic integer-hash
  *      parameters, no RNG) and write REAL idx3-ubyte(.gz) shard files;
  *   2. ingest via [[graft.sources.Idx.readImages]] (D1, /255 normalize —
  *      the reference's transform);
  *   3. [[Hnsw.build]] at exactly dim 784 / M 16 / efc 200 / L2, timed →
  *      the vec/s headline next to the reference's unprinted wall time;
  *   4. golden-invariant gates (the reference's own demo checks):
  *      every sampled query self-matches at rank 1 / distance 0.0, and
  *      recall@10 vs the exact oracle ≥ 0.9 at the default ef budget.
  *
  * Prints one JSON line, committed as `BENCH_SCALE_FMNIST.json`. Run:
  *
  *   SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.FashionShapeProof
  */
object FashionShapeProof {

  /** splitmix64 finalizer — the deterministic "randomness" (no RNG state,
    * a pure function of the index, so the fixture is a pure function of n).
    */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** One 28×28 image: a Gaussian blob at a hash-derived center/width —
    * smooth, low-intrinsic-dimension pixel structure (the property that
    * makes image kNN meaningful), byte-quantized like the real dataset.
    */
  private def image(i: Long): Array[Int] = {
    val h1 = mix(i * 3 + 1); val h2 = mix(i * 3 + 2); val h3 = mix(i * 3 + 3)
    val cx = 4.0 + math.floorMod(h1, 4000L) / 4000.0 * 20.0
    val cy = 4.0 + math.floorMod(h2, 4000L) / 4000.0 * 20.0
    val s2 = { val s = 2.0 + math.floorMod(h3, 300L) / 100.0; 2.0 * s * s }
    val px = new Array[Int](784)
    var r = 0
    while (r < 28) {
      var c = 0
      while (c < 28) {
        val d2 = (r - cx) * (r - cx) + (c - cy) * (c - cy)
        px(r * 28 + c) = (255.0 * math.exp(-d2 / s2)).toInt
        c += 1
      }
      r += 1
    }
    px
  }

  private def writeShard(path: String, from: Long, until: Long): Unit = {
    val out = new DataOutputStream(new GZIPOutputStream(new FileOutputStream(path)))
    out.writeInt(0x00000803) // ubyte, 3 dims
    out.writeInt((until - from).toInt); out.writeInt(28); out.writeInt(28)
    var i = from
    while (i < until) { image(i).foreach(out.write); i += 1 }
    out.close()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(60000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-fmnist-shape-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the reference's exact config (FashionMNIST notebook): 4 shard files
    // so the binaryFile decode parallelizes like a real multi-shard drop
    val dir = java.nio.file.Files.createTempDirectory("fmnist-shape").toString
    val shards = 4
    val per = n / shards
    (0 until shards).foreach { s =>
      writeShard(f"$dir/train-images-$s%02d-idx3-ubyte.gz",
        s * per, if (s == shards - 1) n else (s + 1) * per)
    }
    val input = graft.sources.Idx.readImages(spark, s"$dir/*-idx3-ubyte.gz")
      .localCheckpoint() // decode once; build timing excludes the front door
    val nIn = input.count()
    require(nIn == n, s"IDX front door decoded $nIn of $n images")

    val params = HnswParams(dim = 784, m = 16, efConstruction = 200,
      metric = "l2", numPartitions = 32)
    val t0 = System.nanoTime()
    val index = Hnsw.build(input, params)
    index.edges.count()
    val buildSecs = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[fmnist] build $n x 784 M=16 efc=200 L2 " +
      f"in $buildSecs%.1f s (${n / buildSecs}%.1f vec/s)")

    // golden gates on ~120 sampled queries (indexed vectors themselves)
    // max(1, …): a debug run with n < 120 must degrade to query-every-row,
    // not crash the harness with an opaque modulo-by-zero
    val queries = input.filter(col("id") % lit(math.max(1L, n / 120)) === 0)
      .select(col("id").as("qid"), col("vector")).localCheckpoint()
    val nQ = queries.count()
    val ann = Hnsw.annQuery(index, queries, k = 10).localCheckpoint()
    val self = ann.filter(col("rank") === 1).collect()
    require(self.length == nQ, s"${self.length} rank-1 rows for $nQ queries")
    self.foreach { r =>
      require(r.getLong(2) == r.getLong(0) && r.getDouble(3) == 0.0,
        s"qid ${r.getLong(0)} rank-1 is ${r.getLong(2)} at ${r.getDouble(3)}")
    }
    val exact = Knn.exactTopK(input, queries, 10,
      graft.functions.Distances.metric("l2"))
    val recall = Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
    System.err.println(f"[fmnist] self-match 120/120 at dist 0; recall@10 $recall%.4f")
    require(recall >= 0.9, f"recall@10 $recall%.4f below the 0.9 golden gate")

    println(s"""{"n":$n,"dim":784,"m":16,"ef_construction":200,"metric":"l2",""" +
      s""""num_partitions":32,"build_sec":$buildSecs,""" +
      s""""build_vec_per_sec":${n / buildSecs},""" +
      s""""self_match_at_rank1":true,"recall10_vs_exact":$recall,""" +
      s""""recall_queries":$nQ,"front_door":"idx3-ubyte.gz x $shards"}""")
    spark.stop()
  }
}
