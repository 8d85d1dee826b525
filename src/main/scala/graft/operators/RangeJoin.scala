package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-interval (range) join as a bucketed EQUI-join.
  *
  * A naive `a.join(b, a("t") <= b("t") && b("t") <= a("t") + W)` has no
  * equi-key, so Spark plans a broadcast-nested-loop / cartesian — the
  * classic 100 TB scale trap. With a bounded window the standard fix is
  * temporal bucketing: bucket width = window span, left rows explode to the
  * (≤ 2) buckets their window touches, right rows map to their own bucket,
  * and the join becomes a plain shuffled equi-join on (keys, bucket) with
  * an exact residual filter. Candidate volume is O(matches + window
  * density), never |L|×|R|; AQE handles hot buckets.
  */
object RangeJoin {

  /** Rows of `right` whose `rtCol` lies in [lt + lo, lt + hi] for each left
    * row, equi-matched on `keys` first. Time columns are integer
    * (epoch-style) longs.
    */
  def boundedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ltCol: String,
      rtCol: String,
      lo: Long,
      hi: Long): DataFrame = {
    require(hi >= lo, s"empty window [$lo, $hi]")
    val w = math.max(hi - lo, 1L)
    // bucket id = the bucket's START VALUE (c − c mod w): pure long
    // arithmetic, exact for any magnitude and sign — an actual division
    // would route through doubles and can mis-bucket values ≥ 2^53
    // (e.g. epoch-nanos), silently dropping matches
    def bucket(c: Column): Column = c - pmod(c, lit(w))
    val lb = left
      .withColumn("__lo", col(ltCol) + lit(lo))
      .withColumn("__hi", col(ltCol) + lit(hi))
      .withColumn("__b", explode(array_distinct(array(bucket(col("__lo")), bucket(col("__hi"))))))
    val rb = right.withColumn("__b", bucket(col(rtCol)))
    lb.join(rb, keys :+ "__b")
      .filter(col(rtCol) >= col("__lo") && col(rtCol) <= col("__hi"))
      .drop("__b", "__lo", "__hi")
  }
}
