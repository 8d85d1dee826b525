package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic vector generation (reference `_cli_build` datagen,
  * `hsnw_trial.py:405-414`: n gaussian float32 vectors) — also the fixture
  * generator for tests. Fully distributed: `spark.range` partitions the id
  * space; vectors are a deterministic function of (seed, id) so any cluster
  * size produces the same table.
  */
object Datagen {

  /** n gaussian vectors of the given dim: (id: long, vector: array<float>). */
  def gaussianVectors(spark: SparkSession, n: Long, dim: Int, seed: Long = 42L,
                      numPartitions: Int = 32): DataFrame = {
    // rand/randn are seeded per-column; per-dimension seeds are strided by
    // a large prime because Spark initializes each partition's RNG with
    // (columnSeed + partitionIndex) — consecutive seeds (seed + i) would
    // make dimension i of partition p share the exact random stream with
    // dimension i+1 of partition p-1 (shifted-duplicate coordinates, far
    // from iid). Deterministic for a fixed partition count, which is all
    // the reference's seeded RNG guaranteed too.
    spark.range(0, n, 1, numPartitions)
      .select(col("id"),
        array((0 until dim).map(i => randn(seed + i * 1000003L).cast("float")): _*).as("vector"))
  }

  /** Deterministic synthetic word-soup documents: (doc_id: long, text:
    * string). ~25% of positions are stopwords (so quality/language
    * heuristics have signal); the rest are hashed words `w0`–`w99999`, so
    * the 3-gram shingle space is ~10¹³ and shingle document frequencies
    * stay realistic at millions of docs (a tiny fixed vocabulary would make
    * EVERY shingle ubiquitous and defeat df-capped dedup). Every token is a
    * pure function of (doc_id, position) via xxhash64 — reproducible across
    * any partition layout, the text twin of [[hashVectors]]. Lengths vary
    * 40–119 tokens.
    */
  def syntheticDocs(spark: SparkSession, n: Long, seed: Long = 42L,
                    numPartitions: Int = 32): DataFrame = {
    val stop = array(Seq("the", "a", "of", "and", "is", "in", "to", "it").map(lit): _*)
    val len = (pmod(xxhash64(col("id"), lit(seed)), lit(80L)) + 40L).cast("int")
    spark.range(0, n, 1, numPartitions)
      .select(col("id").as("doc_id"),
        array_join(
          transform(sequence(lit(1), len), i => {
            val h = xxhash64(col("id"), i, lit(seed + 1))
            when(pmod(h, lit(4L)) === 0L,
              element_at(stop, (pmod(xxhash64(col("id"), i, lit(seed + 2)), lit(8L)) + 1).cast("int")))
              .otherwise(concat(lit("w"), pmod(h, lit(100000L)).cast("string")))
          }),
          " ").as("text"))
  }

  /** Deterministic CLUSTERED vectors: each id hashes to one of `nClusters`
    * centers (themselves hash-generated), plus per-component hash noise of
    * amplitude `spread`. Partition-layout independent like [[hashVectors]]
    * (every component is a pure function of (id, dimension)). This is the
    * clusterable-corpus twin of the uniform generator — real embedding
    * corpora sit between the two, so scale proofs measure both: uniform is
    * the worst case for locality sharding (boundaries everywhere), clusters
    * the favorable one.
    */
  /** The cluster assignment [[clusteredVectors]] bakes into each id — a
    * pure Column so proofs can derive geometry-correlated filters (e.g.
    * "allowed = one tight cluster") without duplicating the hash formula.
    */
  def clusterIdCol(nClusters: Int = 1024, seed: Long = 42L): org.apache.spark.sql.Column =
    pmod(xxhash64(col("id"), lit(seed - 1)), lit(nClusters.toLong))

  def clusteredVectors(spark: SparkSession, n: Long, dim: Int,
                       nClusters: Int = 1024, spread: Double = 0.15,
                       seed: Long = 42L, numPartitions: Int = 32): DataFrame = {
    val mod = 1L << 31
    val cid = clusterIdCol(nClusters, seed)
    spark.range(0, n, 1, numPartitions)
      .select(col("id"),
        array((0 until dim).map { i =>
          val ch = pmod(xxhash64(cid, lit(seed + 7000003L * (i + 1))), lit(mod))
          val center = (ch.cast("double") / lit(mod.toDouble)) * 2.0 - 1.0
          val nh = pmod(xxhash64(col("id"), lit(seed + i)), lit(mod))
          val noise = ((nh.cast("double") / lit(mod.toDouble)) * 2.0 - 1.0) * spread
          (center + noise).cast("float")
        }: _*).as("vector"))
  }

  /** Deterministic id-hash-based vectors: reproducible across ANY partition
    * layout (each component is a pure function of (id, dimension index)).
    * Uniform in [-1, 1); used where partition-count independence matters.
    */
  def hashVectors(spark: SparkSession, n: Long, dim: Int, seed: Long = 42L,
                  numPartitions: Int = 32): DataFrame = {
    val mod = 1L << 31
    spark.range(0, n, 1, numPartitions)
      .select(col("id"),
        array((0 until dim).map { i =>
          val h = pmod(xxhash64(col("id"), lit(seed + i)), lit(mod))
          ((h.cast("double") / lit(mod.toDouble)) * 2.0 - 1.0).cast("float")
        }: _*).as("vector"))
  }
}
