package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Scalar (per-dimension affine) quantization of an embedding column — the
  * standard memory/IO optimization for vector search at 100 TB scale: an
  * int8 code per component cuts the float32 footprint 4× before the index
  * or the brute-force rescore ever touches disk.
  *
  * Scale design: the per-dimension (lo, hi) range table is a partial
  * aggregate over the exploded components (shuffle = dim rows), broadcast
  * back for the encode projection — the big table is scanned once and never
  * shuffled. All arithmetic is IEEE-exact single operations
  * (−, ÷, ×, floor) in fixed association order, so a DuckDB oracle
  * reproduces every code byte-for-byte (min/max of doubles are
  * order-independent, unlike sums — this is what makes a quantizer
  * oracle-checkable when a mean-based one would not be).
  */
object Quantize {

  /** Per-dimension range table: (pos, lo, hi). `pos` is 0-based. */
  def dimensionRanges(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs
      .select(posexplode(Distances.toDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))

  /** Exploded int codes: (id, pos, code) with
    * code = floor((x − lo) / (hi − lo) · (2^bits − 1)), 0 for a constant
    * dimension. Codes are exact and deterministic at any parallelism.
    */
  def scalarQuantize(embs: DataFrame, idCol: String, vecCol: String, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val levels = (1 << bits) - 1
    val exploded = embs
      .select(col(idCol), posexplode(Distances.toDouble(col(vecCol))).as(Seq("pos", "x")))
    exploded
      .join(broadcast(dimensionRanges(embs, idCol, vecCol)), "pos")
      .select(col(idCol), col("pos"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * lit(levels.toDouble)))
          .cast("long").as("code"))
  }

  /** Reconstruction: (id, vector: array&lt;double&gt;) from exploded codes +
    * the range table — midpoint-of-cell dequantization (code + 0.5 bins),
    * clamped to [lo, hi] (the top code's midpoint would otherwise overshoot
    * hi by (hi−lo)/(2·levels)).
    */
  def dequantize(codes: DataFrame, ranges: DataFrame, idCol: String, bits: Int = 8): DataFrame = {
    val levels = (1 << bits) - 1
    codes
      .join(broadcast(ranges), "pos")
      .select(col(idCol), col("pos"),
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(least(col("hi"), col("lo") +
            (col("code").cast("double") + lit(0.5)) / lit(levels.toDouble) * (col("hi") - col("lo"))))
          .as("x"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
        s => s.getField("x")).as("vector"))
  }
}
