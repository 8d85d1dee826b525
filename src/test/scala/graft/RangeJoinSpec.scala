package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bounded range join matches the inequality-join semantics exactly") {
    val left = Seq((1L, 100L, 1000L), (1L, 101L, 5000L), (2L, 200L, 1000L))
      .toDF("k", "lid", "lt")
    val right = Seq(
      (1L, 900L, 999L),   // before window of 100
      (1L, 901L, 1000L),  // boundary: == lt
      (1L, 902L, 1500L),  // inside 100's window
      (1L, 903L, 2000L),  // boundary: == lt + hi
      (1L, 904L, 2001L),  // just past
      (1L, 905L, 5500L),  // inside 101's window
      (2L, 906L, 1500L),  // key 2
      (3L, 907L, 1500L),  // key with no left row
    ).toDF("k", "rid", "rt")

    val got = RangeJoin.boundedRangeJoin(left, right, Seq("k"), "lt", "rt", 0L, 1000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val expected = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.rt" >= $"l.lt" && $"r.rt" <= $"l.lt" + 1000L)
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got === Set((100L, 901L), (100L, 902L), (100L, 903L), (101L, 905L), (200L, 906L)))
  }

  test("epoch-nanosecond magnitudes (beyond double precision) bucket exactly") {
    // values near 1.7e18 are far past 2^53: any double arithmetic in the
    // bucket id would mis-assign and silently drop these matches
    val base = 1700000000000000000L
    val left = Seq((1L, 1L, base)).toDF("k", "lid", "lt")
    val right = Seq(
      (1L, 10L, base),                  // boundary ==
      (1L, 11L, base + 999_999_999L),   // inside
      (1L, 12L, base + 1_000_000_001L), // just outside
      (1L, 13L, base - 1L),             // before
    ).toDF("k", "rid", "rt")
    val got = RangeJoin.boundedRangeJoin(left, right, Seq("k"), "lt", "rt", 0L, 1_000_000_000L)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(10L, 11L))
  }

  test("negative offsets (window before the anchor) work") {
    val left = Seq((1L, 1L, 10000L)).toDF("k", "lid", "lt")
    val right = Seq((1L, 10L, 9400L), (1L, 11L, 9000L), (1L, 12L, 8999L), (1L, 13L, 10001L))
      .toDF("k", "rid", "rt")
    val got = RangeJoin.boundedRangeJoin(left, right, Seq("k"), "lt", "rt", -1000L, 0L)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(10L, 11L)) // [9000, 10000]; 12 below, 13 above
  }
}
