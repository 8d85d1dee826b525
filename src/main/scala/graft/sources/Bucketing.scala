package graft.sources

import org.apache.spark.sql.DataFrame

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
}
