package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    // inspect the pre-adaptive plan: bucketed co-location is decided at
    // planning time, AQE wrapping just obscures the tree. Broadcast is
    // disabled so the comparison isolates co-location (a broadcast join
    // also avoids shuffles — for the DIM side; bucketing covers fact-fact).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.length
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = java.nio.file.Paths.get(warehouse, name)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("same-key same-count bucketed tables join with zero shuffles") {
    Seq("b_facts", "b_dims").foreach(dropTable)
    val facts = (0L until 1000L).map(i => (i % 50, i, i * 2.0)).toDF("k", "row_id", "v")
    val dims = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)

    val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
    assert(shuffleCount(joined) === 0, "bucketed join should not shuffle either side")
    assert(joined.count() === 1000)

    // aggregation on the bucket key is also shuffle-free
    val agg = spark.table("b_facts").groupBy("k").agg(sum("v"))
    assert(shuffleCount(agg) === 0, "bucketed agg should not shuffle")
    assert(agg.count() === 50)

    // control: the same join over plain (un-bucketed) frames does shuffle
    val plain = facts.join(dims, "k")
    assert(shuffleCount(plain) > 0)
  }

  test("zValue: matches a bit-twiddling reference; z-sorted shards prune on BOTH columns") {
    import graft.sources.Bucketing
    def zRef(x: Long, y: Long): Long =
      (0 until 31).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    // the max 31-bit inputs exercise the top interleaved position (bit 61):
    // with the old 32-bit default, y >= 2^31 hit the sign bit and went
    // negative — assert the full-domain z stays non-negative
    val big = spark.sql(s"SELECT ${(1L << 31) - 1}L AS x, ${(1L << 31) - 1}L AS y")
      .select(Bucketing.zValue(col("x"), col("y")).as("z")).head().getLong(0)
    assert(big === zRef((1L << 31) - 1, (1L << 31) - 1) && big > 0L)
    val df = spark.range(0, 256).selectExpr("CAST(id / 16 AS LONG) AS x", "CAST(id % 16 AS LONG) AS y")
    val got = df.select(col("x"), col("y"), Bucketing.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z === zRef(x, y), s"z($x,$y)") }
    // locality: order by z, cut into 4 consecutive blocks of 64; each block's
    // x-range and y-range must span at most half the domain (a single-column
    // sort gives full-domain ranges on the other column in every block)
    val sorted = got.sortBy(_._3).grouped(64).toSeq
    sorted.foreach { block =>
      val (xs, ys) = (block.map(_._1), block.map(_._2))
      assert(xs.max - xs.min <= 8, s"x-range too wide: ${xs.min}..${xs.max}")
      assert(ys.max - ys.min <= 8, s"y-range too wide: ${ys.min}..${ys.max}")
    }
  }

  test("z-ordered shards touch fewer files than x-sorted shards for a y filter") {
    import graft.sources.Bucketing
    import org.apache.spark.sql.functions.input_file_name
    val df = spark.range(0, 4096)
      .selectExpr("CAST(id / 64 AS LONG) AS x", "CAST(id % 64 AS LONG) AS y")
    def touched(dir: String): Long =
      spark.read.parquet(dir).filter("y = 5")
        .select(input_file_name()).distinct().count()
    val zDir = java.nio.file.Files.createTempDirectory("zlay").toString + "/out"
    val xDir = java.nio.file.Files.createTempDirectory("xlay").toString + "/out"
    Bucketing.writeShards(df.withColumn("z", Bucketing.zValue(col("x"), col("y"))),
      zDir, "z", recordsPerFile = 256)
    Bucketing.writeShards(df, xDir, "x", recordsPerFile = 256)
    val (zFiles, xFiles) = (touched(zDir), touched(xDir))
    // x-sorted layout scatters every y value across ALL files; the z-order
    // layout concentrates a y slice into a subset — parquet min/max stats
    // then skip the rest at scan time
    assert(xFiles >= 16, s"control should touch every file, got $xFiles")
    assert(zFiles * 2 <= xFiles, s"z-layout touched $zFiles vs control $xFiles — no pruning win")
  }

  test("writeShards: size-bounded files, global order across shards, deterministic re-run") {
    import graft.sources.Bucketing
    val df = spark.range(0, 1000).selectExpr("id", "id * 2 AS payload")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    val nFiles = Bucketing.writeShards(df, dir, "id", recordsPerFile = 128)
    assert(nFiles >= 8, s"1000 rows at <=128/file needs >= 8 files, got $nFiles")
    // every file respects the record bound; total row count preserved
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val perFile = files.map(f => spark.read.parquet(f.getAbsolutePath).count())
    assert(perFile.forall(_ <= 128), s"oversized shard: ${perFile.toSeq}")
    assert(perFile.sum === 1000L)
    // range partitioning: files partition the id space into disjoint intervals
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath).select("id").collect().map(_.getLong(0))
      (ids.min, ids.max, ids.toSeq)
    }.sortBy(_._1)
    ranges.foreach { case (_, _, ids) => assert(ids === ids.sorted, "sorted within file") }
    ranges.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) => assert(max1 < min2, "disjoint ordered ranges")
      case _ =>
    }
    // deterministic: a second run writes identical shard contents
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString + "/out"
    Bucketing.writeShards(df, dir2, "id", recordsPerFile = 128)
    val a = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(dir2).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
