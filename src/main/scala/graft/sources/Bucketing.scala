package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted co-location: bucketed tables make every future equi-join or
  * aggregation on the bucket key shuffle-free on that side — at 100 TB the
  * difference between re-shuffling the fact table per query and never
  * shuffling it again. The bucket count is part of the physical contract:
  * two tables bucketed by the same key into the same count join with NO
  * exchange on either side (just per-bucket sorts, already satisfied when
  * written with `sortBy`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * Repeated pipeline stages (dedup passes, per-key aggs, fact-dim joins)
    * over `key` then read it back shuffle-free via `spark.table(table)`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Z-order (Morton) value of two non-negative int columns: bit b of `x`
    * lands at position 2b, bit b of `y` at 2b+1. Sorting or
    * range-partitioning by this value clusters rows that are close in
    * BOTH dimensions into the same files, so parquet min/max stats prune
    * scans filtered on EITHER column — the standard multi-column
    * data-skipping layout (a single-column sort gives perfect pruning on
    * one column and none on the other). Pure integer bit arithmetic
    * (shift/and/or), so the value is engine-exact and oracle-checkable.
    * Capped at 31 bits per column so the top interleaved bit (2·30+1 = 61)
    * never reaches the long's sign bit: with 32 bits, bit 31 of `y` landed
    * at bit 63, making any y ≥ 2^31 NEGATIVE (sorts before everything —
    * locality contract broken) and overflowing DuckDB's checked `<<` in
    * the SQL twin. 31+31 interleaved bits fit positions 0..61, always
    * non-negative, both engines agree.
    */
  def zValue(x: Column, y: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, "bits per column must be in [1, 31]")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { b =>
      val xb = shiftleft(shiftright(xs, b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(shiftright(ys, b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The same z-value as a DuckDB SQL expression string (oracle twin). */
  def zValueSql(x: String, y: String, bits: Int = 31): String = {
    require(bits >= 1 && bits <= 31, "bits per column must be in [1, 31]")
    (0 until bits).map { b =>
      s"(((($x >> $b) & 1) << ${2 * b}) | ((($y >> $b) & 1) << ${2 * b + 1}))"
    }.mkString(" | ")
  }

  /** Training-shard sink: write `df` as size-bounded, deterministically
    * ordered parquet shards — the delivery format a training run consumes
    * (fixed-size files so data-loader workers stripe evenly; stable
    * content so a re-run of the pipeline produces byte-comparable shards).
    *
    * Layout contract: rows are range-partitioned by `orderCol` (so shard
    * boundaries follow the global order, e.g. pack/sequence id from
    * [[graft.operators.Packing]]), sorted within each shard, and each
    * FILE holds at most `recordsPerFile` rows (`maxRecordsPerFile` splits
    * an oversized partition into consecutive files without re-shuffling).
    *
    * The one driver-side job is the `count()` that sizes the partitioning
    * — unavoidable for a fixed-records contract and amortized over the
    * write. Returns the shard-file count.
    */
  def writeShards(df: DataFrame, outDir: String, orderCol: String,
                  recordsPerFile: Int): Int = {
    require(recordsPerFile > 0, "recordsPerFile must be positive")
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / recordsPerFile).toInt)
    df.repartitionByRange(parts, org.apache.spark.sql.functions.col(orderCol))
      .sortWithinPartitions(orderCol)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", recordsPerFile.toLong)
      .parquet(outDir)
    // Hadoop FS listing, not java.io.File: outDir may be hdfs:// or s3a://
    // (java.io.File.listFiles returns null there and NPEs after a
    // successful write)
    val hPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = hPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(hPath).count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
