package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation. A hot key that would
  * funnel into one reducer is spread over `saltBuckets` sub-keys
  * (deterministic salt from a row hash), partially aggregated, then
  * re-aggregated on the true key — the classic pre-AQE answer, still
  * needed for pathological keys AQE can't split (e.g. a single-key
  * `collect_set`-style state).
  *
  * Only algebraic (re-mergeable) aggregates are supported; `mergeable`
  * maps each partial column to its final merge expression.
  */
object Skew {

  /** Salted count/sum-style aggregation.
    *
    * @param partials  first-phase aggregates over (keys + salt)
    * @param finals    second-phase merge of the partial columns
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    // salt = hash(row content, position-in-partition, partition id): the
    // position term is what spreads IDENTICAL rows — the canonical hot-key
    // case — across buckets (a pure content hash would put every copy of
    // the hot row in one bucket, recreating the straggler). The salt value
    // is partitioning-dependent, which is harmless by construction: only
    // algebraic aggregates are supported, and their two-phase merge is
    // invariant to how rows were salted.
    val salted = df.withColumn("__salt",
      pmod(xxhash64((df.columns.toIndexedSeq.map(col) :+ monotonically_increasing_id()): _*),
        lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted count per key. */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, Seq(key), saltBuckets,
      partials = Seq(count(lit(1)).as("partial_n")),
      finals = Seq(sum(col("partial_n")).as("n")))

  /** Salted sum per key. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, Seq(key), saltBuckets,
      partials = Seq(sum(col(valueCol)).as("partial_s")),
      finals = Seq(sum(col("partial_s")).as("s")))
}
