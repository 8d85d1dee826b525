package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.hnsw.{Hnsw, HnswParams}
import graft.operators.Knn

class HnswSparkSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val input = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vector"))
  private lazy val params = HnswParams(dim = 64, m = 8, efConstruction = 64, numPartitions = 4)

  private lazy val index = Hnsw.build(input, params)

  test("build produces edges on every populated layer and respects caps") {
    val perSrc = index.edges.groupBy("src", "layer").count().collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      val cap = if (r.getInt(1) == 0) params.maxM0Resolved else params.m
      assert(r.getLong(2) <= cap, s"degree ${r.getLong(2)} over cap $cap at layer ${r.getInt(1)}")
    }
  }

  test("ann query self-match and recall vs exact oracle") {
    val queries = input.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector"))
    val ann = Hnsw.annQuery(index, queries, k = 10)
    // self-match at rank 1, dist 0
    val rank1 = ann.filter(col("rank") === 1).collect()
    rank1.foreach { r => assert(r.getAs[Long]("qid") === r.getAs[Long]("id")); assert(r.getAs[Double]("dist") === 0.0) }

    val embD = input.select(col("id"), Distances.toDouble(col("vector")).as("vector"))
    val qD = embD.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector"))
    val exact = Knn.exactTopK(embD, qD, 10, Distances.l2)
    val recall = Hnsw.recallAtK(ann, exact, 10)
      .agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.8, s"avg recall@10 $recall")
  }

  test("save/load round-trip preserves search results (hsnw_trial.py:310-376)") {
    val tmp = Files.createTempDirectory("hnsw-io").toString
    Hnsw.save(index, tmp)
    val loaded = Hnsw.load(spark, tmp)
    assert(loaded.meta === index.meta)
    val queries = input.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
    val before = Hnsw.annQuery(index, queries, 5).collect().map(_.toSeq).toSet
    val after = Hnsw.annQuery(loaded, queries, 5).collect().map(_.toSeq).toSet
    assert(before === after)
  }

  test("partial-aggregate topk equals window topk exactly") {
    val embD = input.select(col("id"), Distances.toDouble(col("vector")).as("vector"))
    val qD = embD.filter(col("id") % 37 === 0).select(col("id").as("qid"), col("vector"))
    val a = Knn.exactTopK(embD, qD, 7, Distances.l2).collect().map(_.toSeq).toSet
    val b = Knn.exactTopKWindow(embD, qD, 7, Distances.l2).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("cross-partition merge yields one navigable graph, sharded for distributed queries") {
    val merged = graft.hnsw.HnswMerge.merge(index, level0SampleMod = 4)
    // caps respected after relational prune (LOGICAL edges — each edge is
    // duplicated to both endpoints' shards, so dedup before counting)
    val over = merged.edges.select("src", "layer", "dst").distinct()
      .groupBy("src", "layer").count()
      .filter((col("layer") === 0 && col("count") > params.maxM0Resolved) ||
              (col("layer") > 0 && col("count") > params.m)).count()
    assert(over === 0)
    // the merged graph stays DISTRIBUTED: >1 query shard, never a
    // single-task whole-graph rebuild
    assert(merged.meta.num_partitions > 1)
    assert(merged.nodes.select("pid").distinct().count() > 1)
    // each id is HOME (non-ghost) in exactly one shard → no duplicate
    // result candidates across shards
    val maxHomes = merged.nodes.filter(!col("tombstone"))
      .groupBy("id").count().agg(max("count")).head().getLong(0)
    assert(maxHomes === 1L)
    // merged graph is queryable across shards with decent recall
    val queries = input.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector"))
    val ann = Hnsw.annQuery(merged, queries, k = 10)
    val dupIds = ann.groupBy("qid", "id").count().filter(col("count") > 1).count()
    assert(dupIds === 0, "ghost copies must never surface as duplicate results")
    val exact = Knn.exactTopK(
      input, input.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector")),
      10, Distances.l2)
    val recall = Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.8, s"merged-graph recall@10 $recall")
    // edges actually span build partitions (check src/dst mix)
    val crossCount = merged.edges
      .filter(pmod(col("src"), lit(4)) =!= pmod(col("dst"), lit(4))).count()
    assert(crossCount > 0, "no cross-partition links created")
  }

  test("filtered ANN: only allowed ids surface, recall vs the exact filtered oracle, large path bit-equal") {
    val attrs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("label"))
    val allowed = attrs.filter(col("label") % 3 === 0).select("id")
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val queries = input.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector"))
    // selectivity ~1/3 → ef widened ~3× (see annQueryFiltered scaladoc)
    val ann = Hnsw.annQueryFiltered(index, queries, k = 10, allowed, ef = 192)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(allowedSet.contains(r.getAs[Long]("id")),
      s"id ${r.getAs[Long]("id")} violates the filter"))

    val embD = input.select(col("id"), Distances.toDouble(col("vector")).as("vector"))
    val qD = embD.filter(col("id") % 50 === 0).select(col("id").as("qid"), col("vector"))
    val exact = Knn.exactTopK(embD.join(allowed, "id"), qD, 10, Distances.l2)
    val recall = Hnsw.recallAtK(ann, exact, 10).agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.8, s"filtered avg recall@10 $recall")

    val large = Hnsw.annQueryFiltered(index, queries, k = 10, allowed, ef = 192, large = true)
    assert(large.collect().map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("filtered ANN with an empty allowed set returns no rows (never crashes the traversal)") {
    val queries = input.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
    val none = input.select("id").filter(lit(false))
    assert(Hnsw.annQueryFiltered(index, queries, k = 5, none).count() === 0L)
  }

  test("empty input builds the empty-index sentinel; queries over it return no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    val idx = Hnsw.build(empty, params)
    assert(idx.meta.entry_point === -1L && idx.meta.max_layer === -1)
    val q = Seq((0L, Array.fill(64)(0f))).toDF("qid", "vector")
    assert(Hnsw.annQuery(idx, q, 3).collect().isEmpty)
  }

  test("ann query is reproducible run-to-run on the same index (normalized adjacency)") {
    val queries = input.filter(col("id") % 60 === 0).select(col("id").as("qid"), col("vector"))
    val a = Hnsw.annQuery(index, queries, k = 10).collect().map(_.toSeq).toSet
    val b = Hnsw.annQuery(index, queries, k = 10).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("chunked query broadcast: many small chunks return exactly the single-chunk result") {
    val queries = input.filter(col("id") % 40 === 0).select(col("id").as("qid"), col("vector"))
    val oneChunk = Hnsw.annQuery(index, queries, k = 5).collect().map(_.toSeq).toSet
    val chunked = Hnsw.annQuery(index, queries, k = 5, queryBatchSize = 2)
      .collect().map(_.toSeq).toSet
    assert(chunked === oneChunk)
    assert(oneChunk.nonEmpty)
    // durable spill variant (cluster path: shared-FS parquet appends)
    val spill = Files.createTempDirectory("ann-spill").toString
    val spilled = Hnsw.annQuery(index, queries, k = 5, queryBatchSize = 2,
      spillPath = Some(spill)).collect().map(_.toSeq).toSet
    assert(spilled === oneChunk)
  }

  test("annQueryLarge over the sharded merged graph matches annQuery on it (ghosts never duplicate)") {
    val merged = graft.hnsw.HnswMerge.merge(index, level0SampleMod = 4)
    val queries = input.filter(col("id") % 70 === 0).select(col("id").as("qid"), col("vector"))
    val viaDriver = Hnsw.annQuery(merged, queries, k = 6).collect().map(_.toSeq).toSet
    val distributed = Hnsw.annQueryLarge(merged, queries, k = 6).collect().map(_.toSeq).toSet
    assert(distributed === viaDriver)
    assert(viaDriver.nonEmpty)
  }

  test("annQueryLarge (no driver round-trip) is bit-equal to annQuery, including on a deleted index") {
    val queries = input.filter(col("id") % 40 === 0).select(col("id").as("qid"), col("vector"))
    val small = Hnsw.annQuery(index, queries, k = 7).collect().map(_.toSeq).toSet
    val large = Hnsw.annQueryLarge(index, queries, k = 7).collect().map(_.toSeq).toSet
    assert(large === small)
    assert(small.nonEmpty)
    // tombstones flow through the distributed path identically
    val del = Hnsw.delete(index, Seq(0L, 40L))
    val a = Hnsw.annQuery(del, queries, k = 7).collect().map(_.toSeq).toSet
    val b = Hnsw.annQueryLarge(del, queries, k = 7).collect().map(_.toSeq).toSet
    assert(b === a)
    assert(!b.exists(r => r(2) == 0L || r(2) == 40L))
  }

  test("delete report: unknown ids report not_found, repeats report already_deleted (hsnw_trial.py:296-305)") {
    val (deleted, report) = Hnsw.deleteWithReport(index, Seq(0L, 8L, 999999L))
    val byId = report.collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(byId(0L) === (true, "deleted"))
    assert(byId(8L) === (true, "deleted"))
    assert(byId(999999L) === (false, "not_found"))
    // a second delete of the same ids reports already_deleted, like the
    // reference returning False on a repeat delete
    val (_, again) = Hnsw.deleteWithReport(deleted, Seq(8L, 999999L))
    val byId2 = again.collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(byId2(8L) === (false, "already_deleted"))
    assert(byId2(999999L) === (false, "not_found"))
  }

  test("delete report on a re-sharded merged index: ghosts never fan out or flip the verdict") {
    val merged = graft.hnsw.HnswMerge.merge(index, level0SampleMod = 4)
    // pick an id that actually has ghost copies (>1 physical row), so the
    // test exercises the collapse, not just the plain path
    val ghosted = merged.nodes.groupBy("id").count()
      .filter(col("count") > 1).orderBy("id").limit(1)
      .collect().headOption.map(_.getLong(0))
    assert(ghosted.nonEmpty, "merge produced no ghost copies — test premise broken")
    val gid = ghosted.get
    val (deletedIdx, report) = Hnsw.deleteWithReport(merged, Seq(gid, 999999L))
    val rows = report.collect()
    assert(rows.length === 2, s"one row per requested id expected, got ${rows.toSeq}")
    val byId = rows.map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(byId(gid) === (true, "deleted"), "live node must report deleted despite tombstoned ghosts")
    assert(byId(999999L) === (false, "not_found"))
    // repeat delete: still one row, now already_deleted
    val (_, again) = Hnsw.deleteWithReport(deletedIdx, Seq(gid))
    val rows2 = again.collect()
    assert(rows2.length === 1)
    assert(rows2.head.getString(2) === "already_deleted")
  }

  test("tombstoned ids are excluded from ann results; rebuild drops them") {
    val deleted = Hnsw.delete(index, Seq(0L, 8L))
    val queries = input.filter(col("id") === 0).select(col("id").as("qid"), col("vector"))
    val res = Hnsw.annQuery(deleted, queries, 10).collect()
    assert(!res.exists(r => r.getAs[Long]("id") == 0L || r.getAs[Long]("id") == 8L))

    val rebuilt = Hnsw.rebuild(deleted, params)
    assert(rebuilt.nodes.count() === input.count() - 2)
  }
}
