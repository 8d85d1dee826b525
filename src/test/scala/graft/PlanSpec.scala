package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression guards: the properties the 100 TB story depends
  * on — pushdown, broadcast, partial aggregation, materialized band table —
  * asserted against the formatted physical plans so a refactor can't
  * silently regress them.
  */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)

  test("predicate pushdown reaches the parquet scan") {
    assert(formatted("q35_range_join").contains("EqualTo(event_type,purchase)"),
      "event_type filter not pushed to the events scan")
    assert(formatted("q06_filter_valid").contains("IsNotNull(embedding)"),
      "null filter not pushed to the embeddings scan")
  }

  test("small dimension side broadcasts (q23)") {
    assert(formatted("q23_join_segment").contains("BroadcastHashJoin"))
  }

  test("aggregations partial-aggregate map-side (q22)") {
    val s = formatted("q22_lineitem_agg")
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "expected partial + final hash aggregates")
  }

  test("q12 banding scans the materialized band table, not raw documents") {
    val s = formatted("q12_lsh_pairs")
    assert(!s.contains("Scan parquet"),
      "q12 re-derives signatures from the raw scan instead of the checkpoint")
    assert(s.contains("Scan ExistingRDD"))
  }

  test("q34 range table is broadcast back to the encode projection") {
    assert(formatted("q34_quantize").contains("BroadcastHashJoin"))
  }
}
