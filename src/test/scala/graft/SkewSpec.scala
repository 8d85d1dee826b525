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

  test("salted sum equals plain sum (integral values, exact)") {
    val df = spark.range(5000).select(lit("only").as("k"), ($"id" % 100).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum($"v")).head().getDouble(1)
    val salted = Skew.saltedSum(df, "k", "v").head().getDouble(1)
    assert(salted === plain)
  }
}
