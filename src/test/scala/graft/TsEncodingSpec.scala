package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The driver has shipped `events.parquet` under two encodings:
  * TIMESTAMP(NANOS) (surfaced as long via nanosAsLong) and timestamp[us]
  * (surfaced as TIMESTAMP_NTZ). `SparkEntry.eventsMicros` must dispatch on
  * the arriving schema and produce identical epoch-microsecond values for
  * identical instants, so every ts-dependent query (q21/q29/q32/q35) is
  * encoding-invariant. This spec writes the same tiny event log both ways
  * and asserts the four query results match row-for-row.
  */
class TsEncodingSpec extends SparkSpec {

  // (event_id, micros, user_id, event_type, value, props); two users, gaps
  // straddling the 600s session break and the 1h range-join bound
  private val rows = Seq(
    (1L, 1700000000000000L, 1L, "click", 1.0, """{"k":60}"""),
    (2L, 1700000100000000L, 1L, "purchase", 2.0, """{"k":10}"""),
    (3L, 1700000200000000L, 1L, "click", 3.0, """{"k":70}"""),
    (4L, 1700001000000000L, 1L, "click", 4.0, """{"k":80}"""),
    (5L, 1700000050000000L, 2L, "purchase", 5.0, """{"k":90}"""),
    (6L, 1700004000000000L, 2L, "click", 6.0, """{"k":20}"""),
    (7L, 1700007700000000L, 2L, "click", 7.0, """{"k":55}""")
  )

  private def writeBoth(): (String, String) = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ts-enc").toString
    val df = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val longDir = s"$base/long"
    val ntzDir = s"$base/ntz"
    // int64 nanos column named ts — same read shape nanosAsLong produces
    df.select(col("event_id"), (col("us") * 1000L).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$longDir/events.parquet")
    // timestamp[us] isAdjustedToUTC=false — read back as TIMESTAMP_NTZ
    df.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$ntzDir/events.parquet")
    (longDir, ntzDir)
  }

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col(_))
    df.select(cols: _*).collect().map(_.toString).toSeq.sorted
  }

  test("q21/q29/q32/q35 produce identical results on nanos-long and timestamp_ntz events") {
    val (longDir, ntzDir) = writeBoth()
    // confirm the two fixtures genuinely exercise both dispatch branches
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    assert(spark.read.parquet(s"$longDir/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    for (q <- Seq("q21_event_window", "q29_sessionize", "q32_asof_join", "q35_range_join")) {
      val a = sortedRows(SparkEntry.queries(q)(spark, longDir))
      val b = sortedRows(SparkEntry.queries(q)(spark, ntzDir))
      assert(a.nonEmpty, s"$q returned no rows on the fixture")
      assert(a == b, s"$q differs across ts encodings")
    }
  }
}
