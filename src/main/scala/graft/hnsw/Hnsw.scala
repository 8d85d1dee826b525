package graft.hnsw

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Distances, Levels}

/** Node row of the persisted index (FIXTURES.md §1 plus the partition id). */
case class NodeRow(id: Long, vector: Array[Float], level: Int, tombstone: Boolean, pid: Int)

/** Edge row of the persisted adjacency (FIXTURES.md §2 plus partition id). */
case class EdgeRow(pid: Int, src: Long, layer: Int, dst: Long)

/** Build/search parameters — reference constructor surface
  * (`hsnw_trial.py:79-100`) with defaults M=16, max_m0=2·M, efc=200, efs=50,
  * mL=1/ln(max(2,M)).
  */
case class HnswParams(
    dim: Int,
    m: Int = 16,
    maxM0: Int = -1,
    efConstruction: Int = 200,
    efSearch: Int = 50,
    mL: Double = Double.NaN,
    metric: String = "l2",
    numPartitions: Int = 16) {
  def maxM0Resolved: Int = if (maxM0 > 0) maxM0 else 2 * m
  def mLResolved: Double = if (mL.isNaN) Levels.defaultML(m) else mL
  require(Distances.metrics.contains(metric), s"unknown metric '$metric'")
}

/** Index metadata — the nine reference fields (`hsnw_trial.py:330-340`)
  * plus the partition count of the distributed build.
  */
case class IndexMeta(
    dim: Int, m: Int, max_m0: Int, ef_construction: Int, ef_search: Int,
    mL: Double, metric: String, entry_point: Long, max_layer: Int,
    num_partitions: Int)

/** A built index: distributed node + edge tables plus small meta. */
case class HnswIndex(nodes: DataFrame, edges: DataFrame, meta: IndexMeta)

/** Tagged-union row shipping nodes (kind 0), edges (kind 1) and replicated
  * queries (kind 2) to each shard in ONE shuffle — the carrier of
  * [[Hnsw.annQueryLarge]]'s driver-free query path. Sorted arrival by
  * (kind, id) lets one pass build the sub-graph and then stream queries.
  */
case class AnnUnionRow(pid: Int, kind: Int, id: Long, vector: Array[Float],
                       level: Int, tombstone: Boolean, layer: Int, dst: Long)

/** Distributed HNSW: partition-parallel batch build, persistence, batch ANN
  * query, tombstone delete and rebuild (SURVEY.md §7.4).
  *
  * Design for scale: the sequential reference insert loop
  * (`hsnw_trial.py:197-265`, single RLock) cannot parallelize, so the build
  * partitions rows deterministically by `id % P`, builds an independent
  * sub-graph per partition with [[LocalHnsw]] inside `mapPartitions` (no
  * shuffle beyond the initial hash partition), and answers queries by
  * searching every sub-graph in parallel and merging with a global top-k —
  * shuffle volume O(queries × k × P), never O(n). Levels are a pure
  * function of id ([[Levels]]), so the build is reproducible on any cluster
  * size.
  */
object Hnsw {

  /** Deterministic partition assignment: id % P (round-robin for dense ids,
    * so every partition sees a representative sample of the data).
    */
  private def withPid(input: DataFrame, p: Int): DataFrame =
    input.withColumn("pid", pmod(col("id"), lit(p.toLong)).cast("int"))

  /** Batch build: (id: long, vector: array&lt;float&gt;) → [[HnswIndex]].
    * Insertion order within a partition is ascending id, making the whole
    * build a pure function of (input, params).
    */
  def build(input: DataFrame, params: HnswParams): HnswIndex = {
    val spark = input.sparkSession
    import spark.implicits._
    val p = params.numPartitions
    val nodes = withPid(input, p)
      .withColumn("level", Levels.levelFor(col("id"), params.mLResolved))
      .withColumn("tombstone", lit(false))
      .select(col("id"), col("vector").cast("array<float>").as("vector"),
        col("level"), col("tombstone"), col("pid"))
      .as[NodeRow]
      // shared by the edge-build pass and metaFor; OWNERSHIP: the cache
      // lives with the returned index — long-lived sessions building many
      // throwaway indexes should index.nodes.unpersist() when done
      .cache()

    // One group per pid (an explicit groupByKey, NOT repartition(p, pid):
    // hash partitioning may co-locate several pids in one task). Rows arrive
    // sorted by id, so insertion order — and therefore the graph — is a pure
    // function of (input, params).
    val edges: Dataset[EdgeRow] = nodes
      .groupByKey(_.pid)
      .flatMapSortedGroups(col("id")) { (pid, rows) =>
        val idx = new LocalHnsw(params.dim, params.m, params.maxM0Resolved,
          params.efConstruction, params.metric)
        rows.foreach(r => idx.add(r.id, r.vector, r.level))
        idx.edges.map { case (src, layer, dst) => EdgeRow(pid, src, layer, dst) }
      }

    val meta = metaFor(nodes.toDF(), params, p)
    HnswIndex(nodes.toDF(), edges.toDF(), meta)
  }

  /** Entry point = lowest id among the highest-level live nodes (reference
    * B6 maintenance, recomputed relationally: ORDER BY level DESC, id ASC).
    * An empty input yields the empty-index sentinel (entry −1, layer −1) —
    * searches over it return no rows, mirroring the reference's
    * empty-index → [] behavior — instead of crashing the build.
    */
  private def metaFor(nodes: DataFrame, params: HnswParams, p: Int): IndexMeta = {
    val top = nodes.filter(!col("tombstone"))
      .orderBy(col("level").desc, col("id").asc).select("id", "level").limit(1).collect()
    val (ep, ml) = top.headOption.map(r => (r.getLong(0), r.getInt(1))).getOrElse((-1L, -1))
    IndexMeta(params.dim, params.m, params.maxM0Resolved, params.efConstruction,
      params.efSearch, params.mLResolved, params.metric, ep, ml, p)
  }

  // ---- persistence (reference P1/P2, `hsnw_trial.py:310-376`) ----

  def save(index: HnswIndex, dir: String): Unit = {
    index.nodes.write.mode("overwrite").parquet(s"$dir/vectors")
    index.edges.write.mode("overwrite").parquet(s"$dir/edges")
    saveMeta(index.meta, dir)
  }

  /** Write only meta.json (used by the streaming append path, which never
    * rewrites existing graph partitions).
    */
  def saveMeta(m: IndexMeta, dir: String): Unit = {
    val json =
      s"""{"dim":${m.dim},"M":${m.m},"max_m0":${m.max_m0},"ef_construction":${m.ef_construction},
         |"ef_search":${m.ef_search},"mL":${m.mL},"metric":"${m.metric}",
         |"entry_point":${m.entry_point},"max_layer":${m.max_layer},"num_partitions":${m.num_partitions}}"""
        .stripMargin.replace("\n", "")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/meta.json"), json)
  }

  /** Load with the reference's defaulting rules for absent meta fields
    * (`hsnw_trial.py:351-355`): efc=200, efs=50, metric="l2", max_m0=2·M.
    */
  def load(spark: SparkSession, dir: String): HnswIndex =
    HnswIndex(
      spark.read.parquet(s"$dir/vectors"),
      spark.read.parquet(s"$dir/edges"),
      loadMeta(dir))

  /** meta.json alone (no table scans) — the streaming append path's cheap
    * entry-point check reads just this.
    */
  def loadMeta(dir: String): IndexMeta = {
    val raw = Files.readString(Paths.get(s"$dir/meta.json"))
    def field(name: String): Option[String] =
      s""""$name"\\s*:\\s*("([^"]*)"|[-0-9.eE]+)""".r.findFirstMatchIn(raw)
        .map(m => Option(m.group(2)).getOrElse(m.group(1)))
    val m = field("M").map(_.toInt).getOrElse(16)
    IndexMeta(
      dim = field("dim").map(_.toInt).getOrElse(0),
      m = m,
      max_m0 = field("max_m0").map(_.toInt).getOrElse(2 * m),
      ef_construction = field("ef_construction").map(_.toInt).getOrElse(200),
      ef_search = field("ef_search").map(_.toInt).getOrElse(50),
      mL = field("mL").map(_.toDouble).getOrElse(Levels.defaultML(m)),
      metric = field("metric").getOrElse("l2"),
      entry_point = field("entry_point").map(_.toLong).getOrElse(-1L),
      max_layer = field("max_layer").map(_.toInt).getOrElse(-1),
      num_partitions = field("num_partitions").map(_.toInt).getOrElse(16))
  }

  // ---- batch ANN query (SURVEY.md Q1b/Q7) ----

  /** Batch ANN: search every partition's sub-graph for every query, then a
    * global per-query top-k merge. The query set is broadcast in bounded
    * chunks of `queryBatchSize` — driver memory never holds more than one
    * chunk, so an unboundedly large `--query-file` cannot OOM the driver
    * (each extra chunk re-scans the index: the documented trade-off; batch
    * query sets are small by contract — SURVEY.md §3.1). The node and edge
    * tables are cogrouped by pid so each task rebuilds exactly one
    * sub-graph. Tombstones are skipped during traversal (not by widening
    * ef) — search cost is independent of the total delete count.
    * Output: (qid, rank, id, dist).
    *
    * Recall tuning: `ef` must grow with the per-partition sub-graph size
    * (n / numPartitions), not with n — at a fixed ef a 10× larger
    * sub-graph is explored proportionally less (measured in
    * BENCH_SCALE.json: recall@10 0.556 at ef=50 vs 0.917 at ef=800 on
    * 156k-node partitions; 0.872 at ef=50 on 15.6k-node ones). Budget ef
    * or partition count accordingly.
    */
  def annQuery(index: HnswIndex, queries: DataFrame, k: Int, ef: Int = -1,
               queryBatchSize: Int = 1 << 16, spillPath: Option[String] = None): DataFrame = {
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val grouped = queries.select(col("qid").cast("long"), col("vector").cast("array<float>"))
      .as[(Long, Array[Float])].toLocalIterator().asScala.grouped(queryBatchSize)
    val first = if (grouped.hasNext) grouped.next().toArray else Array.empty[(Long, Array[Float])]
    val perPart =
      if (!grouped.hasNext) spillPath match {
        // spill applies to the single-chunk case too (uniform contract:
        // the directory always reflects THIS query's candidates)
        case Some(path) =>
          perPartFor(index, first, k, ef)._1.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        case None => perPartFor(index, first, k, ef)._1 // one chunk: fully lazy
      }
      else {
        // each chunk is searched eagerly and its broadcast destroyed before
        // the next chunk is collected — bounded driver memory regardless of
        // query-file size; qids are disjoint across chunks so the global
        // rank window below stays correct. Chunk materialization:
        //   - spillPath (a shared-FS dir on a real cluster): durable parquet
        //     appends — survives executor loss. The caller owns the dir for
        //     the LIFETIME of the returned DataFrame: a second annQuery on
        //     the same path overwrites it under an uncollected result;
        //   - default localCheckpoint: executor-local blocks — fast, but an
        //     executor loss mid-query fails the job (retry from the file).
        var acc = List.empty[DataFrame]
        var chunk = first
        var more = true
        var firstChunk = true
        while (more) {
          val (df, qB) = perPartFor(index, chunk, k, ef)
          spillPath match {
            case Some(path) =>
              df.write.mode(if (firstChunk) "overwrite" else "append").parquet(path)
            case None =>
              acc ::= df.localCheckpoint()
          }
          qB.destroy()
          firstChunk = false
          if (grouped.hasNext) chunk = grouped.next().toArray else more = false
        }
        spillPath.map(spark.read.parquet(_)).getOrElse(acc.reduce(_ union _))
      }
    rankTopK(perPart, k)
  }

  /** Distributed batch ANN with NO driver round-trip — the large-query-set
    * twin of [[annQuery]] (which streams the query set through the driver
    * in bounded chunks and re-scans the index per chunk). Here the query
    * table stays distributed: each query row is replicated to every shard
    * (`explode(sequence(0, P−1))`), unioned with the node and edge tables
    * into one tagged stream, and shuffled ONCE by pid. Each task receives
    * its shard sorted by (kind, id) — nodes first, then edges, then
    * queries — so it rebuilds exactly one sub-graph and then streams the
    * replicated queries through it; the global per-query top-k is the same
    * bounded-heap partial aggregate as [[annQuery]]. Shuffle volume
    * O(nodes + edges + q·P) in, O(q·k·P) out; driver memory O(1); the
    * index is scanned exactly once however large the query set is.
    * Bit-identical to [[annQuery]] on the same inputs (spec-asserted).
    * Output: (qid, rank, id, dist).
    */
  def annQueryLarge(index: HnswIndex, queries: DataFrame, k: Int, ef: Int = -1): DataFrame = {
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val m = index.meta
    val efUsed = math.max(if (ef > 0) ef else m.ef_search, k)
    val p = math.max(1, m.num_partitions)
    val nodesU = index.nodes.select(
      col("pid").cast("int").as("pid"), lit(0).as("kind"), col("id").cast("long").as("id"),
      col("vector").cast("array<float>").as("vector"), col("level"), col("tombstone"),
      lit(0).as("layer"), lit(0L).as("dst"))
    val edgesU = index.edges.select(
      col("pid").cast("int").as("pid"), lit(1).as("kind"), col("src").cast("long").as("id"),
      lit(null).cast("array<float>").as("vector"), lit(0).as("level"), lit(false).as("tombstone"),
      col("layer"), col("dst"))
    val queriesU = queries
      .select(col("qid").cast("long"), col("vector").cast("array<float>").as("vector"))
      .select(explode(sequence(lit(0), lit(p - 1))).as("pid"), lit(2).as("kind"),
        col("qid").as("id"), col("vector"), lit(0).as("level"), lit(false).as("tombstone"),
        lit(0).as("layer"), lit(0L).as("dst"))
    val perPart = nodesU.union(edgesU).union(queriesU).as[AnnUnionRow]
      .groupByKey(_.pid)
      .flatMapSortedGroups(col("kind"), col("id")) { (_, rows) =>
        val it = rows.buffered
        val tomb = scala.collection.mutable.HashSet.empty[Long]
        // lazy slices of the sorted stream: fromRows consumes nodes fully
        // before touching edges, matching the (kind, id) sort order
        val nodeRows = new Iterator[(Long, Array[Float], Int)] {
          def hasNext: Boolean = it.hasNext && it.head.kind == 0
          def next(): (Long, Array[Float], Int) = {
            val n = it.next()
            if (n.tombstone) tomb += n.id
            (n.id, n.vector, n.level)
          }
        }
        val edgeRows = new Iterator[(Long, Int, Long)] {
          def hasNext: Boolean = it.hasNext && it.head.kind == 1
          def next(): (Long, Int, Long) = { val e = it.next(); (e.id, e.layer, e.dst) }
        }
        val idx = LocalHnsw.fromRows(m.dim, m.m, m.max_m0, m.ef_construction, m.metric,
          nodeRows, edgeRows)
        if (idx.size == 0) Iterator.empty
        else it.flatMap { q =>
          idx.search(q.vector, k, efUsed, tomb.contains)
            .iterator.map { case (id, dist) => (q.id, id, dist) }
        }
      }
      .toDF("qid", "id", "dist")
    rankTopK(perPart, k)
  }

  /** Filtered ANN — top-k restricted to an allowed id set (the standard
    * attribute-predicate search of vector engines: "nearest neighbors among
    * `lang = 'en'` docs"). The caller evaluates its predicate wherever the
    * attributes live (`attrs.filter(pred).select("id")`) and passes the
    * surviving ids; filtering composes with ANY Spark predicate that way,
    * with Catalyst pushing it to the attribute scan.
    *
    * Mechanism: filter-as-tombstone. Disallowed nodes get their tombstone
    * flag set in a rewritten node table, and the ordinary query paths do
    * the rest — [[LocalHnsw.searchLayer]] excludes skipped ids from the
    * KEPT set but still routes traversal through them, so a low-selectivity
    * filter cannot disconnect the graph (the classic pre-filter-vs-
    * post-filter failure). The id join shuffles O(nodes) once; no graph
    * rebuild, no edge rewrite.
    *
    * Recall tuning: with selectivity s, a layer-0 sweep of width ef keeps
    * only ≈ s·ef allowed candidates — budget `ef ≳ k/s` (e.g. k=10 at 10%
    * selectivity → ef ≈ 100+). `large = true` routes through
    * [[annQueryLarge]] (no driver round-trip) for big query sets.
    * Output: (qid, rank, id, dist).
    */
  def annQueryFiltered(index: HnswIndex, queries: DataFrame, k: Int,
                       allowedIds: DataFrame, ef: Int = -1,
                       large: Boolean = false): DataFrame = {
    val filtered = withAllowed(index, allowedIds)
    if (large) annQueryLarge(filtered, queries, k, ef)
    else annQuery(filtered, queries, k, ef)
  }

  /** The filter-as-tombstone node rewrite behind [[annQueryFiltered]], as a
    * reusable index view: nodes outside `allowedIds` get their tombstone
    * flag set. Fully lazy (one join plan, no jobs) — the SQL rewrite rule
    * builds this during analysis, where running jobs would make EXPLAIN
    * execute cluster work.
    */
  def withAllowed(index: HnswIndex, allowedIds: DataFrame): HnswIndex = {
    val allowed = allowedIds
      .select(col(allowedIds.columns.head).cast("long").as("id"))
      .distinct()
      .withColumn("__allowed", lit(true))
    val nodes = index.nodes.join(allowed, Seq("id"), "left")
      .withColumn("tombstone", col("tombstone") || col("__allowed").isNull)
      .drop("__allowed")
    index.copy(nodes = nodes)
  }

  /** ANN for an in-memory query batch. Plan construction runs NO Spark job
    * (the broadcast is driver-side) — the SQL rewrite rule builds this
    * during analysis, where submitting jobs would make EXPLAIN execute
    * cluster work.
    */
  def annQueryBatch(index: HnswIndex, qArr: Array[(Long, Array[Float])],
                    k: Int, ef: Int = -1): DataFrame =
    rankTopK(perPartFor(index, qArr, k, ef)._1, k)

  /** Global per-query top-k over the per-partition candidates via the
    * bounded-heap partial aggregate — shuffle O(q·k), not a full window
    * sort of the q·k·P candidate set. Deterministic (dist asc, id asc),
    * bit-identical to the window form (equivalence spec-tested for Knn).
    */
  private def rankTopK(perPart: DataFrame, k: Int): DataFrame =
    perPart.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))

  /** Per-partition sub-graph search for one broadcast chunk: cogroup nodes
    * and edges by pid, rebuild each sub-graph, emit (qid, id, dist)
    * candidates (k per query per partition).
    */
  private def perPartFor(index: HnswIndex, qArr: Array[(Long, Array[Float])], k: Int, ef: Int):
      (DataFrame, org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Float])]]) = {
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val m = index.meta
    val efUsed = math.max(if (ef > 0) ef else m.ef_search, k)
    val nodesDs = index.nodes.select("id", "vector", "level", "tombstone", "pid").as[NodeRow]
      .groupByKey(_.pid)
    val edgesDs = index.edges.select("pid", "src", "layer", "dst").as[EdgeRow]
      .groupByKey(_.pid)
    val qB = spark.sparkContext.broadcast(qArr)
    val df = nodesDs.cogroup(edgesDs) { (pid, nodeIt, edgeIt) =>
      val nodeArr = nodeIt.toArray
      if (nodeArr.isEmpty) Iterator.empty
      else {
        val tomb = nodeArr.iterator.filter(_.tombstone).map(_.id).toSet
        val idx = LocalHnsw.fromRows(m.dim, m.m, m.max_m0, m.ef_construction, m.metric,
          nodeArr.iterator.map(n => (n.id, n.vector, n.level)),
          edgeIt.map(e => (e.src, e.layer, e.dst)))
        qB.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k, efUsed, tomb.contains)
            .iterator.map { case (id, dist) => (qid, id, dist) }
        }
      }
    }.toDF("qid", "id", "dist")
    (df, qB)
  }

  // ---- mutation / lifecycle (reference M1/B7) ----

  /** Lazy tombstone delete as an immutable snapshot rewrite. */
  def delete(index: HnswIndex, ids: Seq[Long]): HnswIndex = {
    val nodes = index.nodes.withColumn("tombstone",
      col("tombstone") || col("id").isin(ids: _*))
    index.copy(nodes = nodes)
  }

  /** Delete with a per-id outcome report — reference M1 parity: the
    * reference's `delete` returns False for out-of-bounds or
    * already-deleted ids (`hsnw_trial.py:296-305`); the distributed twin
    * reports the same outcome relationally. One row per REQUESTED id:
    * (id, deleted, status) with status ∈ {deleted, already_deleted,
    * not_found}. The lookup filters the node table down to the requested
    * ids (pushed to the scan) and broadcasts that bounded slice against
    * the request list — never a full-table collect.
    *
    * Merged-index safe: a re-sharded merged graph ([[HnswMerge.merge]])
    * stores up to numShards−1 tombstoned GHOST copies of a node in foreign
    * shards, so the raw node table has several rows per id. The lookup
    * collapses to one row per id first — a node is live iff ANY copy is
    * live (only the home copy ever is) — so the report keeps its
    * one-row-per-requested-id contract and a live node never also reports
    * `already_deleted` from its ghosts.
    */
  def deleteWithReport(index: HnswIndex, ids: Seq[Long]): (HnswIndex, DataFrame) = {
    val spark = index.nodes.sparkSession
    import spark.implicits._
    val req = ids.toDF("id")
    val present = index.nodes.filter(col("id").isin(ids: _*))
      .groupBy(col("id"))
      .agg((min(when(col("tombstone"), 1).otherwise(0)) === 1).as("tombstone"))
    val report = req.join(broadcast(present), Seq("id"), "left")
      .select(col("id"),
        coalesce(!col("tombstone"), lit(false)).as("deleted"),
        when(col("tombstone").isNull, lit("not_found"))
          .when(col("tombstone"), lit("already_deleted"))
          .otherwise(lit("deleted")).as("status"))
    (delete(index, ids), report)
  }

  /** Rebuild from live rows only (reference `rebuild`, `hsnw_trial.py:381-389`). */
  def rebuild(index: HnswIndex, params: HnswParams): HnswIndex =
    build(index.nodes.filter(!col("tombstone")).select("id", "vector"), params)

  /** Compact an index that has accumulated many small sub-graphs — the
    * maintenance pass a streaming deployment runs periodically:
    * [[graft.streaming.StreamingOps.incrementalAdd]] appends one isolated
    * sub-graph per micro-batch, and since every query searches every pid,
    * per-query fan-out grows with batch count while per-sub-graph recall
    * quality shrinks. Compaction merges them into ONE navigable graph
    * re-sharded into `targetShards` balanced query shards
    * ([[HnswMerge.merge]]: IVF-blocked boundary kNN for cross-sub-graph
    * links, relational degree prune, ghost-fringe sharding) — no
    * per-vector re-insertion, unlike [[rebuild]], which re-runs the full
    * build. Tombstoned rows stay tombstoned through the merge; run
    * [[rebuild]] instead when the goal is reclaiming deleted mass.
    */
  def compact(index: HnswIndex, targetShards: Int): HnswIndex = {
    require(targetShards > 0, s"compact: targetShards must be positive, got $targetShards")
    HnswMerge.merge(index, numShards = targetShards)
  }

  // ---- evaluation (SURVEY.md D8 — the reference's declared-but-missing test) ----

  /** recall@k of the ANN result against the exact oracle, per query and
    * overall. Input frames both shaped (qid, rank, id, dist).
    */
  def recallAtK(ann: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = ann.select("qid", "id")
      .join(exact.select(col("qid"), col("id")), Seq("qid", "id"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    exact.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble)).as("recall"))
  }
}
