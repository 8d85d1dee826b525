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
