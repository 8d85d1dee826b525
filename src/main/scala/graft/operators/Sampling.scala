package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for data-mixing quotas — the step that turns a
  * cleaned corpus into a training mixture ("50% of the English, 20% of
  * everything else…").
  *
  * `rand()`-based sampling is nondeterministic across retries and
  * partitionings; hash-rate sampling keys the decision on the row id:
  * keep iff `h(id) mod 100 < rate`, with h = the integer value of the
  * first 8 md5 hex chars of the id — reproducible on any cluster, any
  * partitioning, any engine (md5 + integer arithmetic only, so a DuckDB
  * oracle replays the exact sample).
  *
  * Hash width and rate bias: a w-bit hash leaves each rate with an
  * absolute bias of at most (2^w mod 100)/2^w. The 32-bit hash used here
  * bounds it at ~2.3e-8 (a 16-bit hash would be ~5e-4 — visible in quota
  * accounting at billions of rows).
  */
object Sampling {

  /** 32-bit md5-based hash of the (stringified) id column. */
  def idHash(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep rows where hash(id) mod 100 < ratePct. `ratePct` may be a per-row
    * expression (stratified quotas) or a literal.
    */
  def hashSample(df: DataFrame, idCol: String, ratePct: Column): DataFrame =
    df.filter(pmod(idHash(col(idCol)), lit(100L)) < ratePct)
}
