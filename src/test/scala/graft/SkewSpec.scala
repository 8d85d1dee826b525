package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain count on a pathologically skewed key") {
    // 90% of rows share one key
    val df = spark.range(10000)
      .select(when($"id" % 10 === 0, concat(lit("k"), $"id" % 7)).otherwise(lit("hot")).as("k"))
      .cache()
    val plain = df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(plain("hot") === 9000L)
  }

  test("IDENTICAL hot rows spread across many salt buckets (the point of salting)") {
    // 2000 byte-identical rows of one key: a content-only salt would put
    // them all in ONE phase-1 group. The phase-2 count of phase-1 groups
    // reveals the spread through the public API.
    val hot = Seq.fill(2000)(("hot", 1L)).toDF("k", "v").repartition(4)
    val row = Skew.saltedAgg(hot, Seq("k"), saltBuckets = 32,
      partials = Seq(count(lit(1)).as("pn")),
      finals = Seq(count(lit(1)).as("n_salt_groups"), sum(col("pn")).as("n"))).head()
    assert(row.getLong(2) === 2000L)               // correctness: total preserved
    assert(row.getLong(1) >= 16L, s"only ${row.getLong(1)} salt groups — hot key not spread")
  }

  test("salted sum equals plain sum (integral values, exact)") {
    val df = spark.range(5000).select(lit("only").as("k"), ($"id" % 100).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum($"v")).head().getDouble(1)
    val salted = Skew.saltedSum(df, "k", "v").head().getDouble(1)
    assert(salted === plain)
  }
}
