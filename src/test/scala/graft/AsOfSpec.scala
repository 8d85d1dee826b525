package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right time at or before each left row, per key") {
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 50L, "t0"), (2L, 100L, "t3"))
      .toDF("key", "t", "tag")
    val quotes = Seq((1L, 90L), (1L, 100L), (1L, 150L), (2L, 500L)).toDF("key", "t")
    val res = AsOf.asOfJoin(trades, quotes, "key", "t", "q_t")
      .select("tag", "q_t").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(res("t0") === None)       // no quote at or before 50
    assert(res("t1") === Some(100L)) // inclusive: quote AT 100 wins over 90
    assert(res("t2") === Some(150L))
    assert(res("t3") === None)       // key 2's only quote is later
  }
}
