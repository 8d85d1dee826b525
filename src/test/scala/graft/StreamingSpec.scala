package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.hnsw.{Hnsw, HnswParams}
import graft.operators.Knn
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(id: Long, dim: Int): Array[Float] = {
    val rng = new scala.util.Random(id)
    Array.fill(dim)(rng.nextGaussian().toFloat)
  }

  test("incremental add: micro-batches append sub-graphs; queries see all batches") {
    val dir = Files.createTempDirectory("hnsw-stream").toString
    val params = HnswParams(dim = 16, m = 8, efConstruction = 32, numPartitions = 2)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    val stream = source.toDF().toDF("id", "vector")
    // one continuous query; each processAllAvailable cycle is a micro-batch
    // (restarting without a checkpoint would replay the MemoryStream)
    val query = StreamingOps.incrementalAdd(stream, dir, params).start()
    source.addData((0L until 50L).map(i => (i, randVec(i, 16))): _*)
    query.processAllAvailable()
    source.addData((50L until 80L).map(i => (i, randVec(i, 16))): _*)
    query.processAllAvailable()
    query.stop()

    val index = Hnsw.load(spark, dir)
    assert(index.nodes.count() === 80)
    // query a vector from each batch: self-match at rank 1
    val queries = Seq((7L, randVec(7L, 16)), (77L, randVec(77L, 16))).toDF("qid", "vector")
    val res = Hnsw.annQuery(index, queries, k = 3).filter(col("rank") === 1).collect()
    assert(res.map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap === Map(7L -> 7L, 77L -> 77L))
    res.foreach(r => assert(r.getAs[Double]("dist") === 0.0))
    // the driver-free large path must ALSO see appended shards (it
    // replicates queries to the actual pid set, not the base 0..P-1 range
    // — a meta-derived range silently missed every appended batch)
    val large = Hnsw.annQueryLarge(index, queries, k = 3).filter(col("rank") === 1).collect()
    assert(large.map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap ===
      Map(7L -> 7L, 77L -> 77L), "annQueryLarge must search appended micro-batch shards")
    // the ghost-share invariant survives non-routed appends (ADVICE r14):
    // num_nodes is summed incrementally like node_rows, so
    // node_rows/num_nodes keeps measuring the ghost factor instead of
    // drifting toward the clamp over a long stream
    val m = Hnsw.loadMeta(dir)
    assert(m.num_nodes === 80, "appendBatch must sum num_nodes incrementally")
    assert(m.node_rows === 80, "plain (un-routed) appends store no ghosts")
  }

  test("routed incremental add: appended batches stay reachable through the routed probe") {
    val dir = Files.createTempDirectory("hnsw-routed-stream").toString
    val params = HnswParams(dim = 16, m = 8, efConstruction = 32, numPartitions = 2)
    // bootstrap: a routed base index on disk
    val base = (0L until 200L).map(i => (i, randVec(i, 16))).toDF("id", "vector")
    Hnsw.save(Hnsw.buildRouted(base, params, cellsPerShard = 2), dir)
    val metaBefore = Hnsw.loadMeta(dir)
    assert(metaBefore.num_cells === 4)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    val query = StreamingOps.incrementalAddRouted(
      source.toDF().toDF("id", "vector"), dir, params).start()
    source.addData((200L until 240L).map(i => (i, randVec(i, 16))): _*)
    query.processAllAvailable()
    source.addData((240L until 260L).map(i => (i, randVec(i, 16))): _*)
    query.processAllAvailable()
    query.stop()

    val index = Hnsw.load(spark, dir)
    // every appended vector present; routing table grew rows, geometry fixed
    assert(index.nodes.select("id").distinct().count() === 260)
    val cents = index.centroids.get
    assert(cents.select("cid", "cvector").distinct().count() === 4,
      "appends must not change the cell geometry")
    assert(cents.count() > 4, "touched cells must gain routing rows for the batch shards")
    assert(Hnsw.loadMeta(dir).num_nodes === 260, "num_nodes must track appends")
    // the ROUTED probe finds vectors from the base AND both appended batches
    val queries = Seq((7L, randVec(7L, 16)), (222L, randVec(222L, 16)), (255L, randVec(255L, 16)))
      .toDF("qid", "vector")
    val res = Hnsw.annQueryRouted(index, queries, k = 3)
      .filter(col("rank") === 1).collect()
    assert(res.map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap ===
      Map(7L -> 7L, 222L -> 222L, 255L -> 255L),
      "routed query must self-match across base and appended shards")
    res.foreach(r => assert(r.getAs[Double]("dist") === 0.0))
    // plain appendBatch into a routed dir would strand data: the routed
    // append is required to keep the probe complete (guard asserts loudly
    // on a non-routed dir instead of corrupting)
    val plainDir = Files.createTempDirectory("hnsw-plain-guard").toString
    Hnsw.save(Hnsw.build(base, params), plainDir)
    val err = intercept[IllegalArgumentException] {
      StreamingOps.appendBatchRouted(base.limit(5), plainDir, params, batchId = 0L)
    }
    assert(err.getMessage.contains("not a routed index"))
  }

  test("routed append maps only the cells the batch landed in; sibling-cell probes skip it") {
    val dir = Files.createTempDirectory("hnsw-routed-cells").toString
    val params = HnswParams(dim = 16, m = 8, efConstruction = 32, numPartitions = 2)
    val base = (0L until 200L).map(i => (i, randVec(i, 16))).toDF("id", "vector")
    Hnsw.save(Hnsw.buildRouted(base, params, cellsPerShard = 2), dir)
    val p = Hnsw.loadMeta(dir).num_partitions
    val homeCells = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getAs[Long]("cid"),
        r.getAs[Seq[Double]]("cvector").map(_.toFloat).toArray, r.getAs[Int]("pid")))
    // craft a batch glued to ONE cell's centroid; spill=0 keeps it there
    val (cid0, cv0, pid0) = homeCells.head
    val batch = (1000L until 1010L).map { i =>
      (i, cv0.zipWithIndex.map { case (x, j) => x + (if (j == 0) (i - 1000L) * 1e-4f else 0f) })
    }.toDF("id", "vector")
    StreamingOps.appendBatchRouted(batch, dir, params, batchId = 0L, spill = 0.0)
    val cents2 = spark.read.parquet(s"$dir/centroids")
    val newRows = cents2.filter(col("pid") >= p)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Int]("pid")))
    assert(newRows.map(_._1).toSet === Set(cid0),
      s"batch landed only in cell $cid0 — routing rows for sibling cells amplify probes")
    assert(newRows.length === 1)
    val batchPid = newRows.head._2
    // a probe pinned to a DIFFERENT cell of the same home pid must not
    // ship the batch shard
    val sibling = homeCells.find(c => c._3 === pid0 && c._1 != cid0)
    sibling.foreach { case (_, cvSib, _) =>
      val index = Hnsw.load(spark, dir)
      val q = Seq((0L, cvSib)).toDF("qid", "vector")
      val probed = Hnsw.probedPidsFor(index, q, probeCells = 1)
        .collect().map(_.getAs[Int]("pid")).toSet
      assert(!probed.contains(batchPid),
        s"sibling-cell probe shipped batch shard $batchPid: $probed")
    }
    // while a probe of the touched cell DOES reach the batch
    val index = Hnsw.load(spark, dir)
    val qTouched = Seq((1L, cv0)).toDF("qid", "vector")
    val probedTouched = Hnsw.probedPidsFor(index, qTouched, probeCells = 1)
      .collect().map(_.getAs[Int]("pid")).toSet
    assert(probedTouched.contains(batchPid))
    // appended data must remain searchable end-to-end
    val self = Hnsw.annQueryRouted(index, Seq((1005L,
      cv0.zipWithIndex.map { case (x, j) => x + (if (j == 0) 5 * 1e-4f else 0f) })).toDF("qid", "vector"),
      k = 1).collect()
    assert(self.head.getAs[Long]("id") === 1005L && self.head.getAs[Double]("dist") === 0.0)
    // mismatched partition count is a loud error, not silent pid collision
    val err = intercept[IllegalArgumentException] {
      StreamingOps.appendBatchRouted(batch, dir, params.copy(numPartitions = 4), batchId = 9L)
    }
    assert(err.getMessage.contains("num_partitions"))
  }

  test("compactRouted: appended shards fold back to P home shards, geometry and recall kept") {
    val dir = Files.createTempDirectory("hnsw-routed-compact").toString
    val params = HnswParams(dim = 16, m = 8, efConstruction = 32, numPartitions = 2)
    val base = (0L until 200L).map(i => (i, randVec(i, 16))).toDF("id", "vector")
    Hnsw.save(Hnsw.buildRouted(base, params, cellsPerShard = 2), dir)
    // three appended batches accumulate shards with pid >= P
    (0 until 3).foreach { b =>
      val batch = ((200 + b * 20).toLong until (220 + b * 20).toLong)
        .map(i => (i, randVec(i, 16))).toDF("id", "vector")
      StreamingOps.appendBatchRouted(batch, dir, params, batchId = b.toLong)
    }
    val grown = Hnsw.load(spark, dir)
    val p = params.numPartitions
    assert(grown.nodes.select("pid").distinct().count() > p, "appends must have added shards")
    val geomBefore = grown.centroids.get.select("cid", "cvector").distinct()
      .collect().map(r => r.getAs[Long]("cid")).sorted.toSeq

    val compacted = Hnsw.compactRouted(grown, params)
    // shard count back to P; routing table back to its home rows
    assert(compacted.nodes.select("pid").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq === (0 until p))
    assert(compacted.centroids.get.count() === geomBefore.size.toLong)
    assert(compacted.centroids.get.select("cid").collect()
      .map(_.getLong(0)).sorted.toSeq === geomBefore, "cell geometry must be preserved")
    assert(compacted.meta.num_cells === grown.meta.num_cells)
    // num_nodes restored to the exact distinct live count
    assert(compacted.meta.num_nodes === 260)
    assert(compacted.nodes.select("id").distinct().count() === 260)
    // the routed probe still self-matches across base and appended data
    val queries = Seq((7L, randVec(7L, 16)), (215L, randVec(215L, 16)), (255L, randVec(255L, 16)))
      .toDF("qid", "vector")
    val res = Hnsw.annQueryRouted(compacted, queries, k = 3)
      .filter(col("rank") === 1).collect()
    assert(res.map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap ===
      Map(7L -> 7L, 215L -> 215L, 255L -> 255L))
    res.foreach(r => assert(r.getAs[Double]("dist") === 0.0))
    // guards: plain index rejected; mismatched P rejected
    intercept[IllegalArgumentException] {
      Hnsw.compactRouted(Hnsw.build(base, params), params)
    }
    intercept[IllegalArgumentException] {
      Hnsw.compactRouted(grown, params.copy(numPartitions = 4))
    }
    grown.nodes.unpersist(); compacted.nodes.unpersist()
  }

  test("compaction: accumulated micro-batch sub-graphs merge into balanced shards, recall preserved") {
    val dir = Files.createTempDirectory("hnsw-compact").toString
    val params = HnswParams(dim = 16, m = 8, efConstruction = 32, numPartitions = 2)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    val query = StreamingOps.incrementalAdd(source.toDF().toDF("id", "vector"), dir, params).start()
    (0 until 4).foreach { b =>
      source.addData((b * 40L until (b + 1) * 40L).map(i => (i, randVec(i, 16))): _*)
      query.processAllAvailable()
    }
    query.stop()

    val accumulated = Hnsw.load(spark, dir)
    val pidsBefore = accumulated.nodes.select("pid").distinct().count()
    assert(pidsBefore === 8, "4 batches x 2 partitions accumulate 8 isolated sub-graphs")

    val compacted = Hnsw.compact(accumulated, targetShards = 2)
    val homePids = compacted.nodes.filter(!col("tombstone")).select("pid").distinct().count()
    assert(homePids === 2)
    // every live node is homed exactly once (ghost copies are all tombstoned)
    assert(compacted.nodes.filter(!col("tombstone")).count() === 160)

    val queries = Seq(3L, 47L, 89L, 123L, 159L).map(i => (i, randVec(i, 16))).toDF("qid", "vector")
    val ann = Hnsw.annQuery(compacted, queries, k = 5, ef = 64)
    val exact = Knn.exactTopK(
      accumulated.nodes.select(col("id"), graft.functions.Distances.toDouble(col("vector")).as("vector")),
      queries.select(col("qid"), graft.functions.Distances.toDouble(col("vector")).as("vector")),
      5, graft.functions.Distances.l2)
    val recall = Hnsw.recallAtK(ann, exact, 5).agg(avg("recall")).head().getDouble(0)
    assert(recall >= 0.8, s"post-compaction avg recall@5 $recall")
  }

  test("streaming ann query: micro-batched queries answered against a static index") {
    implicit val sqlCtx = spark.sqlContext
    val input = (0L until 60L).map(i => (i, randVec(i, 16))).toDF("id", "vector")
    val index = Hnsw.build(input, HnswParams(dim = 16, m = 8, efConstruction = 32, numPartitions = 2))
    val out = Files.createTempDirectory("ann-serve").toString

    val source = MemoryStream[(Long, Array[Float])]
    val query = StreamingOps.streamingAnnQuery(
      source.toDF().toDF("qid", "vector"), index, out, k = 3).start()
    source.addData((7L, randVec(7L, 16)))
    query.processAllAvailable()
    source.addData((21L, randVec(21L, 16)), (33L, randVec(33L, 16)))
    query.processAllAvailable()
    query.stop()

    val res = spark.read.parquet(out)
    assert(res.count() === 9) // 3 queries x k=3
    val self = res.filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap
    assert(self === Map(7L -> 7L, 21L -> 21L, 33L -> 33L))
  }

  test("streaming dedup keeps first doc per fingerprint within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingOps.streamingDedup(
      source.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
    val query = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    source.addData((t0, 1L, "same text"), (t0, 2L, "same text"), (t0, 3L, "other text"))
    query.processAllAvailable()
    query.stop()
    val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
    assert(ids.size === 2)
    assert(ids.contains(3L))
    assert(ids.intersect(Set(1L, 2L)).size === 1)
  }

  test("streaming incremental dedup: micro-batches statused against a static corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs today"),
    ).toDF("doc_id", "text")
    val outDir = java.nio.file.Files.createTempDirectory("sid-out").toString
    val source = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingOps.streamingIncrementalDedup(
      source.toDF().toDF("doc_id", "ts", "text"), corpus,
      "doc_id", "ts", "text", outDir, minJaccard = 0.2)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sid-ckpt").toString)
      .start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    source.addData(
      (10L, t0, "the quick brown fox jumps over the lazy dog"),   // exact vs corpus
      (11L, t0, "the quick brown fox jumps over the sleepy dog")) // near vs corpus
    query.processAllAvailable()
    source.addData(
      (12L, t0, "completely unrelated words appear in this one"), // new
      (13L, t0, "the quick brown fox jumps over the lazy dog"))   // in-stream repeat of 10 → dropped
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === Set(10L, 11L, 12L), "in-stream repeat must be dropped by the fingerprint state")
    assert(out(10L) === "exact_dup")
    assert(out(11L) === "near_dup")
    assert(out(12L) === "new")
  }

  test("streaming end-to-end prepare: streamed verdicts bit-equal one batch; budget is order-free") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pipeline
    // 36-token docs with disjoint token universes (the PipelineSpec
    // goodDoc idiom): gate-passing unless junk
    def good(seed: Int) = (0 until 34).map(i => s"tok${seed * 100 + i}").mkString(" ") + " the and"
    val corpus = Seq((0L, good(900)), (1L, good(901))).toDF("doc_id", "text")
    val outDir = java.nio.file.Files.createTempDirectory("sprep-out").toString
    val source = MemoryStream[(Long, Timestamp, String, String)]
    val query = StreamingOps.streamingPrepare(
      source.toDF().toDF("doc_id", "ts", "source", "text"), corpus,
      "doc_id", "ts", "source", "text", outDir, minJaccard = 0.2)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sprep-ckpt").toString)
      .start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val batch1 = Seq(
      (10L, t0, "web", good(10)),                          // new
      (11L, t0, "web", "x" * 2500),                        // junk -> rejected_quality
      (12L, t0, "web", good(900)))                         // exact vs corpus
    val batch2 = Seq(
      (13L, t0, "news", good(901).replace("tok90101", "swapped")), // near vs corpus
      (14L, t0, "news", good(14)),                         // new
      (15L, t0, "news", good(10)))                         // in-stream repeat of 10's TEXT -> dropped
    source.addData(batch1: _*)
    query.processAllAvailable()
    source.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.read.parquet(outDir).drop("batch_id")
    val got = streamed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    // batch reference: the SAME ladder over the union minus the in-stream
    // text repeat (the fingerprint state drops 15 before verdicts run)
    val union = (batch1 ++ batch2).filter(_._1 != 15L)
      .map(t => (t._1, t._3, t._4)).toDF("doc_id", "source", "text")
    val ref = Pipeline.prepareVerdicts(union, corpus, "doc_id", "source", "text",
      minJaccard = 0.2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(got === ref, "streamed verdicts must bit-equal one batch over the union")
    assert(got.map(t => t._1 -> t._3).toMap === Map(
      10L -> "new", 11L -> "rejected_quality", 12L -> "exact_dup",
      13L -> "near_dup", 14L -> "new"))
    // budget over the ACCUMULATED verdict table: order-free, equals the
    // batch rule over the union (quota 1 token -> only each source's best
    // bin survives; both 'new' docs here are their source's best bin)
    val budget = Pipeline.budgetFromVerdicts(streamed, "doc_id", "source", quota = 1L)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(budget.keySet === Set(10L, 14L), "only admitted docs reach the budget")
    assert(budget.values.forall(_ == 1))
    // and the streamed quota table bit-equals the batch one — the same
    // budgetFromVerdicts kernel the q120 oracle row hash-pins, so the
    // streaming quota dashboard is transitively oracle-checked
    val refDf = Pipeline.prepareVerdicts(union, corpus, "doc_id", "source", "text",
      minJaccard = 0.2)
    val bStreamed = Pipeline.budgetFromVerdicts(streamed, "doc_id", "source", quota = 40L)
      .collect().map(_.toSeq).toSet
    val bBatch = Pipeline.budgetFromVerdicts(refDf, "doc_id", "source", quota = 40L)
      .collect().map(_.toSeq).toSet
    assert(bStreamed === bBatch, "streamed quota table must bit-equal the batch kernel's")
  }

  test("streaming frozen-LM scoring: streamed scores bit-equal the batch form across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val trainDocs = (0L until 20L)
      .map(i => (i, s"the quick fox ${if (i % 3 == 0) "jumps high" else "runs far"}"))
      .toDF("doc_id", "text")
    val lm = graft.operators.Retrieval.lmTable(trainDocs, "text")
    val arrivals = Seq(
      (100L, "the quick fox jumps high"),   // all-known transitions
      (101L, "the quick fox swims deep"),   // two unseen bigrams
      (102L, "completely novel text here")) // everything unseen
    val outDir = Files.createTempDirectory("slm-out").toString
    val source = MemoryStream[(Long, String)]
    val query = StreamingOps.streamingLmScore(
      source.toDF().toDF("doc_id", "text"), lm, "doc_id", "text", outDir)
      .option("checkpointLocation", Files.createTempDirectory("slm-ckpt").toString)
      .start()
    source.addData(arrivals(0), arrivals(1))
    query.processAllAvailable()
    source.addData(arrivals(2))
    query.processAllAvailable()
    query.stop()
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("lp_total_fp"), r.getAs[Double]("avg_nats"))).toSet
    val batch = graft.operators.Retrieval.lmScoreAgainst(
        arrivals.toDF("doc_id", "text"), lm, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch, "micro-batching must not move a single bit")
    // the all-unseen doc sits exactly at the floor: 3 bigrams x -20e6
    assert(streamed.find(_._1 == 102L).get._3 === 3L * -20000000L)
  }

  test("streaming NB quality filter: streamed verdicts bit-equal the batch form; OOV-only docs absent") {
    implicit val sqlCtx = spark.sqlContext
    val seed = Seq(
      (0L, 1, "good good the"), (1L, 1, "good the"),
      (2L, 0, "bad the"), (3L, 0, "bad bad bad the")).toDF("doc_id", "cls", "text")
    val model = graft.operators.Classify.nbModel(seed, "cls", "text")
    val priors = graft.operators.Classify.nbPriors(seed, "cls")
    val arrivals = Seq(
      (100L, "good good zzz"),  // curated-speak + one OOV token
      (101L, "bad bad"),        // raw-speak
      (102L, "zzz qqq"))        // all OOV: must be absent from output
    val outDir = Files.createTempDirectory("snb-out").toString
    val source = MemoryStream[(Long, String)]
    val query = StreamingOps.streamingNbScore(
      source.toDF().toDF("doc_id", "text"), model, priors, "doc_id", "text", outDir)
      .option("checkpointLocation", Files.createTempDirectory("snb-ckpt").toString)
      .start()
    source.addData(arrivals(0))
    query.processAllAvailable()
    source.addData(arrivals(1), arrivals(2))
    query.processAllAvailable()
    query.stop()
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_known"),
        r.getAs[Long]("llr_fp"), r.getAs[Int]("pred_hq"))).toSet
    val batch = graft.operators.Classify.nbScore(
        arrivals.toDF("doc_id", "text"), model, priors, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamed === batch, "micro-batching must not move a single bit")
    assert(streamed.map(_._1) === Set(100L, 101L))
    assert(streamed.find(_._1 == 100L).get._4 === 1)
    assert(streamed.find(_._1 == 101L).get._4 === 0)
  }

  test("streaming winnow overlap: arriving docs statused against frozen corpus sketches") {
    implicit val sqlCtx = spark.sqlContext
    val run = "a b c d e f g h i j k l"
    val corpus = Seq(
      (0L, run + " m n o p"),
      (1L, "u v w x y z q r s t aa bb")).toDF("doc_id", "text")
    val arrivals = Seq(
      (100L, "z y " + run),                                       // shares doc 0's run
      (101L, "fresh words entirely unrelated to anything stored here today"))
    val outDir = Files.createTempDirectory("swo-out").toString
    val source = MemoryStream[(Long, String)]
    val query = StreamingOps.streamingWinnowOverlap(
      source.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text", outDir)
      .option("checkpointLocation", Files.createTempDirectory("swo-ckpt").toString)
      .start()
    source.addData(arrivals(0))
    query.processAllAvailable()
    source.addData(arrivals(1))
    query.processAllAvailable()
    query.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("overlap_of"), r.getAs[Long]("n_shared"))).toMap
    assert(got(100L)._1 === "overlap" && got(100L)._2 === 0L && got(100L)._3 >= 2L)
    assert(got(101L) === (("new", -1L, 0L)))
    // streamed verdicts bit-equal the batch form
    val batch = graft.operators.Dedup.winnowOverlapAgainst(
        arrivals.toDF("doc_id", "text"),
        graft.operators.Dedup.winnowSketch(corpus, "doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === batch)
  }

  test("streaming semantic dedup: micro-batches statused by embedding proximity vs a static corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (0L until 30L).map(i => (i, randVec(i, 16))).toDF("id", "vector")
    val outDir = Files.createTempDirectory("ssd-out").toString
    val source = MemoryStream[(Long, Array[Float])]
    val query = StreamingOps.streamingSemanticDedup(
      source.toDF().toDF("id", "vector"), corpus, "id", "vector", dim = 16,
      outDir, maxDist = 0.05)
      .option("checkpointLocation", Files.createTempDirectory("ssd-ckpt").toString)
      .start()
    // 100: exact re-encoding of corpus id 7; 101: tiny perturbation of id 3;
    // 102: fresh vector far from everything
    val nearOf3 = randVec(3, 16).map(x => x + 1e-4f)
    source.addData((100L, randVec(7, 16)), (101L, nearOf3))
    query.processAllAvailable()
    source.addData((102L, randVec(999L, 16)))
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("status"), r.getAs[Long]("n_near"))).toMap
    assert(out.keySet === Set(100L, 101L, 102L))
    assert(out(100L)._1 === "semantic_dup" && out(100L)._2 >= 1L)
    assert(out(101L)._1 === "semantic_dup")
    assert(out(102L)._1 === "new" && out(102L)._2 === 0L)
  }

  test("streaming bloom dedup: exact statuses via bloom probe + confirm, corpus scanned once") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (0L until 30L).map(i => (i, s"corpus document body number $i"))
      .toDF("doc_id", "text")
    val outDir = java.nio.file.Files.createTempDirectory("sbd-out").toString
    val source = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingOps.streamingBloomDedup(
      source.toDF().toDF("doc_id", "ts", "text"), corpus,
      "doc_id", "ts", "text", outDir, mBits = 1L << 16, k = 5)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sbd-ckpt").toString)
      .start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    source.addData(
      (100L, t0, "corpus document body number 7"),   // exact vs corpus
      (101L, t0, "never seen before content here"))  // new
    query.processAllAvailable()
    source.addData(
      (102L, t0, "corpus document body number 8"),   // exact vs corpus, batch 2
      (103L, t0, "corpus document body number 7"))   // in-stream repeat of 100 → dropped
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === Set(100L, 101L, 102L), "in-stream repeat dropped by fingerprint state")
    assert(out(100L) === "exact_dup")
    assert(out(101L) === "new")
    assert(out(102L) === "exact_dup")
    // idempotent-replay layout: one overwrite-partition per non-empty batch
    val batchDirs = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.length >= 2, s"expected per-batch partitions, got ${batchDirs.toSeq}")
  }

  test("streaming span scrub: corpus-known spans removed per micro-batch, keep-first") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((0L, "shared boiler plate text END")).toDF("doc_id", "text")
    val outDir = java.nio.file.Files.createTempDirectory("ssc-out").toString
    val source = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingOps.streamingSpanScrub(
      source.toDF().toDF("doc_id", "ts", "text"), corpus,
      "doc_id", "ts", "text", outDir, k = 3)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ssc-ckpt").toString)
      .start()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    source.addData(
      (100L, t0, "u1 shared boiler plate text u2"), // interior corpus span
      (101L, t0, "all original words right here"))  // untouched
    query.processAllAvailable()
    source.addData(
      (102L, t0, "shared boiler plate text"),       // fully covered, batch 2
      (103L, t0, "u1 shared boiler plate text u2")) // in-stream repeat of 100 → dropped
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out.keySet === Set(100L, 101L, 102L), "in-stream repeat dropped by fingerprint state")
    assert(out(100L) === (("u1 u2", 2L)), "covered tokens removed, order kept")
    assert(out(101L) === (("all original words right here", 5L)))
    assert(out(102L) === (("", 0L)), "fully-duplicated doc survives as empty row")
  }

  test("streaming boilerplate scrub: frozen corpus template, streamed ≡ batch bit-for-bit, new hosts untouched") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    // corpus: host A's 4 docs all share a footer line → template on A
    val corpus = (0L until 4L).map(i => (i, "A", s"old $i\nad footer"))
      .toDF("doc_id", "host", "text")
    val outDir = java.nio.file.Files.createTempDirectory("sbp-out").toString
    val source = MemoryStream[(Long, String, String)]
    val query = StreamingOps.streamingBoilerplateScrub(
      source.toDF().toDF("doc_id", "host", "text"), corpus,
      "doc_id", "host", "text", outDir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sbp-ckpt").toString)
      .start()
    source.addData(
      (100L, "A", "fresh a\nad footer"),   // template removed
      (101L, "B", "fresh b\nad footer"))   // host B has no corpus history
    query.processAllAvailable()
    source.addData((102L, "A", "ad footer"))  // all-template doc, batch 2
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(100L) === ((2L, 1L, "fresh a")), "corpus template leaves the stream doc")
    assert(out(101L) === ((2L, 0L, "fresh b\nad footer")),
      "a host the corpus never saw passes through untouched")
    assert(out(102L) === ((1L, 1L, "")), "all-template doc keeps an empty row")
    // streamed accumulation ≡ one batch scrub with the same frozen template
    val template = Dedup.boilerplateLines(corpus, "doc_id", "host", "text")
      .filter(col("is_boilerplate") === 1).select(col("host"), col("key"))
    val batchRef = Dedup.scrubBoilerplateWithTemplate(
      Seq((100L, "A", "fresh a\nad footer"), (101L, "B", "fresh b\nad footer"),
        (102L, "A", "ad footer")).toDF("doc_id", "host", "text"),
      template, "doc_id", "host", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out === batchRef, "streamed ≡ batch bit-for-bit")
  }

  test("streaming mixture counts: per-source totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val counts = StreamingOps.streamingMixtureCounts(
      source.toDF().toDF("source", "text"), "source", "text")
    val query = counts.writeStream.format("memory").queryName("mix_out")
      .outputMode("complete").start()
    source.addData(("web", "a b c"), ("web", "d e"), ("books", "f g h i"))
    query.processAllAvailable()
    source.addData(("web", "j"), ("wiki", "k l"))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("mix_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("web") === ((3L, 6L)), "3 web docs, 6 tokens total across batches")
    assert(out("books") === ((1L, 4L)))
    assert(out("wiki") === ((1L, 2L)))
    // snapshot equals the batch operator over the same rows
    val batch = Seq(("web", "a b c"), ("web", "d e"), ("books", "f g h i"),
      ("web", "j"), ("wiki", "k l")).toDF("source", "text")
    val ref = graft.operators.Sampling.mixtureWeights(batch, "source", "text")
      .select("source", "n_docs", "n_tokens").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ref === out)
  }

  test("streaming pii scrub: stateless redaction projection runs unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    // Pii is a pure projection (no state, no shuffle) — the exact batch
    // expression drops into a streaming plan with no operator changes
    val scrubbed = source.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.Pii.redact(col("text")).as("text"),
        graft.operators.Pii.emailCount(col("text")).as("n_emails"))
    val query = scrubbed.writeStream.format("memory").queryName("pii_out")
      .outputMode("append").start()
    source.addData((1L, "mail a@b.co now"), (2L, "clean"))
    query.processAllAvailable()
    source.addData((3L, "ping 10.0.0.1 and 555-1234"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("pii_out").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      (1L, "mail <EMAIL> now", 1L),
      (2L, "clean", 0L),
      (3L, "ping <IP> and <PHONE>", 0L)))
  }

  test("stateful sessionization: gap closes sessions in-stream, watermark times out idle ones") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Timestamp)]
    val sessions = StreamingOps.sessionizeStream(
      source.toDF().toDF("user_id", "event_id", "ts"),
      gapMs = 600000L, watermark = "10 minutes")
    val query = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // user 1: three events in one burst; user 2: one event
    source.addData((1L, 10L, t("2024-01-01 10:00:00")),
                   (1L, 11L, t("2024-01-01 10:01:00")),
                   (1L, 12L, t("2024-01-01 10:02:00")),
                   (2L, 20L, t("2024-01-01 10:00:00")))
    query.processAllAvailable()
    // user 1 returns after > gap: closes the first session inside the fn
    source.addData((1L, 13L, t("2024-01-01 10:30:00")))
    query.processAllAvailable()
    // far-future event advances the watermark → idle sessions time out
    source.addData((99L, 90L, t("2024-01-01 12:00:00")))
    query.processAllAvailable()
    source.addData((99L, 91L, t("2024-01-01 14:00:00")))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("sess_out")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    assert(rows.contains((1L, "2024-01-01 10:00:00", 3L))) // closed by the gap
    assert(rows.contains((1L, "2024-01-01 10:30:00", 1L))) // closed by timeout
    assert(rows.contains((2L, "2024-01-01 10:00:00", 1L))) // closed by timeout
    assert(!rows.exists(_._1 == 99L) || rows.exists(r => r._1 == 99L && r._2 == "2024-01-01 12:00:00"))
  }

  test("stateful sessionization: in-watermark late events extend backwards or split correctly") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Timestamp)]
    val sessions = StreamingOps.sessionizeStream(
      source.toDF().toDF("user_id", "event_id", "ts"),
      gapMs = 600000L, watermark = "30 minutes") // watermark wider than gap
    val query = sessions.writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    source.addData((1L, 10L, t("2024-01-01 10:00:00")),
                   (1L, 11L, t("2024-01-01 10:01:00")),
                   (1L, 12L, t("2024-01-01 10:02:00")))
    query.processAllAvailable()
    // late but within gap of the open session start → extends it BACKWARDS
    source.addData((1L, 13L, t("2024-01-01 09:55:00")))
    query.processAllAvailable()
    // late and more than a gap before the open session → its own session
    source.addData((1L, 14L, t("2024-01-01 09:40:00")))
    query.processAllAvailable()
    // watermark advance times out the open session
    source.addData((99L, 90L, t("2024-01-01 11:00:00")))
    query.processAllAvailable()
    source.addData((99L, 91L, t("2024-01-01 13:00:00")))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("sess_late_out")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    assert(rows.contains((1L, "2024-01-01 09:40:00", 1L)), s"split session missing: $rows")
    assert(rows.contains((1L, "2024-01-01 09:55:00", 4L)), s"backward-extended session missing: $rows")
  }

  test("windowed event counts with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.windowedEventCounts(
      source.toDF().toDF("ts", "event_type"), "ts")
    val query = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    source.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click"),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "view"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("win_out")
      .select(col("window.start").cast("string"), col("event_type"), col("n_events"))
      .as[(String, String, Long)].collect().toSet
    assert(rows === Set(
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 11:00:00", "view", 1L)))
  }

  test("standing queries: streamed BM25 scores equal the batch scores bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val corpusRows = Seq(
      (0L, "spark scan join spark table"),
      (1L, "rare spark table row value"),
      (2L, "rare rare rare scan"),
      (3L, "key value store"))
    val corpus = corpusRows.toDF("doc_id", "text")
    val terms = Seq("rare", "spark")
    // stats must cover the union of ALL standing queries' terms — a term
    // missing from the idf table scores 0 by contract
    val (idf, nd, lt) = graft.operators.Retrieval.bm25Stats(corpus, "doc_id", "text",
      terms :+ "key")
    assert(nd === 4L && lt === 17L)

    val source = MemoryStream[(Long, String)]
    val scored = StreamingOps.standingQueryScores(
      source.toDF().toDF("doc_id", "text"), "doc_id", "text",
      queries = Seq(9 -> terms, 5 -> Seq("key")), idf, nd, lt)
    val query = scored.writeStream.format("memory").queryName("standing_out")
      .outputMode("append").start()
    source.addData(corpusRows.take(2): _*)
    query.processAllAvailable()
    source.addData(corpusRows.drop(2): _*)
    query.processAllAvailable()
    query.stop()
    val out = spark.table("standing_out").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // query 9 equals the batch single-query form over the same corpus
    val batch = graft.operators.Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batch.keySet === out.keys.collect { case (id, 9) => id }.toSet)
    batch.foreach { case (id, s) => assert(out((id, 9)) === s, s"doc $id") }
    // 'key' appears only in doc 3 — query 5 fires exactly there
    assert(out.keys.collect { case (id, 5) => id }.toSet === Set(3L))
  }

  test("streaming term stats: live df/tf/dl totals equal the batch derivation") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val stats = StreamingOps.streamingTermStats(
      source.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val query = stats.writeStream.format("memory").queryName("term_out")
      .outputMode("complete").start()
    source.addData((0L, "spark scan spark"), (1L, "scan table"))
    query.processAllAvailable()
    source.addData((2L, "spark table table table"))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("term_out").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // df = docs containing the term; n_occ = total occurrences;
    // dl_sum = Σ doc length over docs containing the term
    assert(out("spark") === ((2L, 3L, 7L)), "docs 0+2; tf 2+1; dl 3+4")
    assert(out("scan") === ((2L, 2L, 5L)), "docs 0+1; tf 1+1; dl 3+2")
    assert(out("table") === ((2L, 4L, 6L)), "docs 1+2; tf 1+3; dl 2+4")
    // cross-check against the batch derivation Retrieval.bm25TopK uses
    val batch = Seq((0L, "spark scan spark"), (1L, "scan table"),
      (2L, "spark table table table")).toDF("doc_id", "text")
    val toks = batch.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val ref = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), sum("tf").as("n_occ"), sum("dl").as("dl_sum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ref === out)
  }

  test("streaming image dedup: arriving images statused against frozen corpus fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    val m = graft.multimodal.MediaOps
    // corpus: two distinct images, pixels wrap-free in 50..149
    def png(seed: Int, rowShift: Int) = m.encodeGrayPng(16, 12,
      (x, y) => 50 + (x * 7 + y * 13 + seed * (x * x + 3 * y)) % 100 +
        (if (y == 0) rowShift else 0))
    val corpusHashes = m.imagePhash(
      Seq((0L, png(0, 0)), (1L, png(9, 0))).toDF("id", "content"))
    val outDir = Files.createTempDirectory("simg-out").toString
    val source = MemoryStream[(Long, Array[Byte])]
    val query = StreamingOps.streamingImageDedup(
      source.toDF().toDF("id", "content"), corpusHashes, outDir, maxHamming = 8)
      .option("checkpointLocation", Files.createTempDirectory("simg-ckpt").toString)
      .start()
    source.addData(
      (10L, png(0, 50)),  // brightness-shifted twin of corpus 0
      (11L, png(5, 0)))   // unrelated
    query.processAllAvailable()
    source.addData((12L, png(9, 0))) // byte-identical re-encode of corpus 1
    query.processAllAvailable()
    query.stop()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(10L, 11L, 12L))
    assert(out(10L) === (("near_dup", 0L, out(10L)._3)) && out(10L)._3 <= 8L)
    assert(out(11L)._1 === "new" && out(11L)._2 === -1L)
    assert(out(12L) === (("near_dup", 1L, 0L)), "identical image at hamming 0")
  }

  test("streaming link graph: accumulated degrees bit-equal to the batch graph of the union; frontier flips") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pipeline
    val outDir = Files.createTempDirectory("slg-out").toString
    val source = MemoryStream[(String, String)]
    val query = StreamingOps.streamingLinkGraph(
      source.toDF().toDF("host", "html"), "host", "html", outDir)
      .option("checkpointLocation", Files.createTempDirectory("slg-ckpt").toString)
      .start()
    // batch 1 links to c.org before it is ever crawled (frontier row);
    // batch 2 crawls c.org, which then links back
    val b1 = Seq(("a.com", """<a href="http://b.com/1">l</a> <a href="http://c.org/2">l</a>"""))
    val b2 = Seq(("c.org", """<a href="http://a.com/3">l</a>"""))
    source.addData(b1: _*)
    query.processAllAvailable()
    source.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    val ids = new java.io.File(s"$outDir/degrees").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).map(_.drop(9).toInt).sorted
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val last = rows(spark.read.parquet(s"$outDir/degrees/batch_id=${ids.last}"))
    val want = rows(Pipeline.hostLinkGraph((b1 ++ b2).toDF("host", "html"), "host", "html"))
    assert(last === want, "streamed degree snapshot must equal the one-shot graph")
    val first = rows(spark.read.parquet(s"$outDir/degrees/batch_id=${ids.head}"))
    assert(first.exists(r => r._1 == "c.org" && r._2 == 0 && r._4 == 1),
      "mid-stream: c.org is a frontier row (linked, never crawled)")
    assert(last.exists(r => r._1 == "c.org" && r._2 == 1),
      "after its pages arrive the frontier host carries out-degree")
  }

  test("streaming CMS sketch: cell-wise accumulation bit-equal to the batch sketch of the union") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextStats
    val outDir = Files.createTempDirectory("cms-out").toString
    val source = MemoryStream[(Long, String)]
    val query = StreamingOps.streamingCmsSketch(
      source.toDF().toDF("doc_id", "text"), "text", outDir, depth = 3, width = 16)
      .option("checkpointLocation", Files.createTempDirectory("cms-ckpt").toString)
      .start()
    val b1 = Seq((0L, "alpha beta alpha"), (1L, "gamma beta"))
    val b2 = Seq((2L, "alpha delta delta epsilon"), (3L, "beta"))
    source.addData(b1: _*)
    query.processAllAvailable()
    source.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    val batchIds = new java.io.File(s"$outDir/sketch").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).map(_.drop(9).toInt).sorted
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val last = cells(spark.read.parquet(s"$outDir/sketch/batch_id=${batchIds.last}")
      .select(col("seed").cast("int"), col("bucket"), col("cnt")))
    val want = cells(TextStats.cmsSketch((b1 ++ b2).toDF("doc_id", "text"), "text",
      depth = 3, width = 16))
    assert(last === want,
      "streamed cell-wise merge must equal the one-shot sketch of the concatenation")
    // the mid-stream snapshot is the sketch of batch 1 alone
    val first = cells(spark.read.parquet(s"$outDir/sketch/batch_id=${batchIds.head}")
      .select(col("seed").cast("int"), col("bucket"), col("cnt")))
    assert(first === cells(TextStats.cmsSketch(b1.toDF("doc_id", "text"), "text", 3, 16)))
  }

  test("streaming vocab drift: accumulated drift table bit-equal to batch vocabDrift over the union") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextStats
    val reference = Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta epsilon zeta"))
      .toDF("doc_id", "text")
    val outDir = Files.createTempDirectory("svd-out").toString
    val source = MemoryStream[(Long, String)]
    val query = StreamingOps.streamingVocabDrift(
      source.toDF().toDF("doc_id", "text"), reference, "text", outDir, topN = 10)
      .option("checkpointLocation", Files.createTempDirectory("svd-ckpt").toString)
      .start()
    val b1 = Seq((10L, "alpha beta gamma delta"), (11L, "spamword spamword eta"))
    val b2 = Seq((12L, "spamword theta iota"), (13L, "alpha beta kappa lambda"))
    source.addData(b1: _*)
    query.processAllAvailable()
    source.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    val batchIds = new java.io.File(s"$outDir/drift").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).map(_.drop(9).toInt).sorted
    val last = spark.read.parquet(s"$outDir/drift/batch_id=${batchIds.last}")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val want = TextStats.vocabDrift(reference, (b1 ++ b2).toDF("doc_id", "text"), "text", topN = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(last.sorted.toSeq === want.sorted.toSeq,
      "snapshot after the last batch must equal the one-batch derivation bit-for-bit")
    assert(last.exists(t => t._2 == "spamword" && t._1 == 1L),
      "the planted burst leads the drift table")
    // the mid-stream snapshot reflects only batch 1
    val first = spark.read.parquet(s"$outDir/drift/batch_id=${batchIds.head}")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val wantFirst = TextStats.vocabDrift(reference, b1.toDF("doc_id", "text"), "text", topN = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(first.sorted.toSeq === wantFirst.sorted.toSeq)
  }
}
