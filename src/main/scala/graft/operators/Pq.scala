package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Product quantization — the canonical 100 TB ANN memory layout (IVF-PQ):
  * the vector is split into `m` contiguous sub-blocks, each sub-block gets
  * its own k-cell codebook (Lloyd's k-means), and a vector is stored as
  * `m` small cell ids (m bytes at k ≤ 256 — a 256× footprint cut for a
  * 512-dim float32 embedding at m=8).
  *
  * Scale design: all m codebooks train TOGETHER as one grouped k-means
  * over the materialized (sub, id) slice table — per iteration one
  * broadcast-assign + one partial-agg mean pass, never m sequential
  * per-block jobs; encoding is a single broadcast-assign pass re-grouped
  * by id. The big table is never shuffled except for the O(n) code
  * assembly. Codes are deterministic given the trained codebooks
  * (min(struct) tie-break by cell id).
  */
object Pq {

  /** One row per (sub, id): the sliced sub-vector, as doubles. */
  private def subVectors(vectors: DataFrame, dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    vectors
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("vector"))
      .select(col("id"), col("sub"),
        slice(Distances.toDouble(col("vector")), col("sub") * lit(subDim) + lit(1), lit(subDim))
          .as("vector"))
  }

  /** Train per-sub-block codebooks: (sub, cid, cvector) with cvector of
    * length dim/m. `dim` must be divisible by `m`.
    *
    * All m sub-block codebooks train TOGETHER as one grouped Lloyd's
    * k-means — the sub-block id is just another grouping key, so each
    * iteration is a single broadcast-assign + one partial-agg mean pass
    * over the (sub, id) rows, not m sequential per-block jobs (which cost
    * m× the fixed job overhead and m× the input scans).
    */
  def pqFit(vectors: DataFrame, dim: Int, m: Int, k: Int, iters: Int = 3,
            spillPath: Option[String] = None): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    def sub(name: String): Option[String] = spillPath.map(root => s"$root/$name")
    // materialized once: the training loop reads this on BOTH sides of the
    // means join every iteration — unmaterialized it would re-explode the
    // source per side per iteration (the q12-style recompute disease).
    // spillPath makes every loop materialization durable parquet instead of
    // executor-local blocks (see Checkpoints.materialize; caller owns the
    // dir for the lifetime of the returned frame)
    val subs = Checkpoints.materialize(subVectors(vectors, dim, m), sub("subs"))
    // deterministic init: slice the k lowest-id VECTORS (a bounded
    // TakeOrdered on the unexploded table — a window over the full
    // exploded table would funnel every sub-block's rows into one task
    // just to pick k seeds)
    val seeds = vectors.orderBy(col("id").asc).limit(k)
    val w = Window.partitionBy("sub").orderBy(col("id").asc) // over m·k seed rows only
    var centroids = Checkpoints.materialize(
      subVectors(seeds, dim, m)
        .withColumn("rn", row_number().over(w))
        .select(col("sub"), (col("rn") - 1).cast("long").as("cid"), col("vector").as("cvector")),
      sub("codebooks_0"))
    for (i <- 1 to iters) {
      val assigned = assignGrouped(subs, centroids)
      val means = assigned.join(subs, Seq("sub", "id"))
        .select(col("sub"), col("cid"), posexplode(col("vector")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos")).agg(avg(col("x")).as("mn"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("cvector"))
      val superseded = centroids
      centroids = Checkpoints.materialize(
        centroids.select(col("sub"), col("cid"), col("cvector").as("prev"))
          .join(means, Seq("sub", "cid"), "left")
          .select(col("sub"), col("cid"), coalesce(col("cvector"), col("prev")).as("cvector")),
        sub(s"codebooks_$i"))
      // previous iteration's copy is unreachable — free it
      Checkpoints.release(superseded, sub(s"codebooks_${i - 1}"))
    }
    // training is done: the slice table was only read by the loop above
    Checkpoints.release(subs, sub("subs"))
    centroids
  }

  /** Nearest codebook cell per (sub, id): broadcast the (small) codebook
    * table, argmin via partial-aggregable min(struct).
    */
  private def assignGrouped(subs: DataFrame, codebooks: DataFrame): DataFrame =
    subs.join(broadcast(codebooks), Seq("sub"))
      .select(col("sub"), col("id"),
        struct(Distances.sqDist(col("vector"), col("cvector")).as("dist"), col("cid")).as("sc"))
      .groupBy(col("sub"), col("id")).agg(min(col("sc")).as("best"))
      .select(col("sub"), col("id"), col("best.cid").as("cid"))

  /** Encode: (id, codes: array&lt;long&gt; of length m) — codes[j] is the
    * nearest cell of sub-block j's codebook. One pass over the (sub, id)
    * rows for all sub-blocks.
    */
  def pqEncode(vectors: DataFrame, codebooks: DataFrame, dim: Int, m: Int): DataFrame =
    assignGrouped(subVectors(vectors, dim, m), codebooks)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cid")))),
        s => s.getField("cid")).as("codes"))

  /** ADC (asymmetric distance) top-k over PQ codes: per query, a lookup
    * table of squared distances from each query sub-vector to every
    * codebook cell (|q|·m·k rows — tiny — broadcast), joined to the
    * exploded code table and partial-agg summed per (query, vector), then
    * the bounded-heap top-k. The original vectors are never read: the scan
    * is m longs per row instead of `dim` floats — the point of PQ at
    * 100 TB. Output: (qid, rank, id, dist) with dist = √Σⱼ‖q⁽ʲ⁾−c⁽ʲ⁾‖².
    *
    * QUERY-SET SIZE CONTRACT: the LUT broadcast bounds `queries` (q·m·k
    * rows must fit a broadcast); for larger query sets go through
    * [[ivfPqTopKLarge]] (shuffled LUT join).
    */
  def adcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
              dim: Int, m: Int, k: Int): DataFrame = {
    val subDim = dim / m
    val lut = queries.crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub"), col("cid"),
        Distances.sqDist(
          slice(Distances.toDouble(col("vector")), col("sub") * lit(subDim) + lit(1), lit(subDim)),
          col("cvector")).as("d2"))
    val exploded = codes.select(col("id"), posexplode(col("codes")).as(Seq("sub", "cid")))
    val scored = exploded
      .join(broadcast(lut), Seq("sub", "cid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2")).as("d2sum"))
      .select(col("qid"), col("id"), sqrt(col("d2sum")).as("dist"))
    scored.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** IVF-PQ top-k — the canonical 100 TB ANN read path: coarse IVF cells
    * prune the candidate set (only `nprobe` cells per query are read), and
    * ADC over PQ codes scores the survivors. Per-candidate IO is one coarse
    * cell id + m code bytes; the float vectors are never touched.
    *
    * QUERY-SET SIZE CONTRACT: the per-query LUT (q·m·k rows) is broadcast,
    * so `queries` must stay within broadcast limits (≤ ~10⁵ queries at
    * m=8, k=256). For all-pairs/kNN-join-scale query sets use
    * [[ivfPqTopKLarge]], which shuffles the LUT instead.
    *
    * @param assignedCodes (id, cid, codes) — each vector's coarse cell and
    *                      PQ codes (from [[Ivf.assign]] + [[pqEncode]])
    */
  def ivfPqTopK(assignedCodes: DataFrame, codebooks: DataFrame, centroids: DataFrame,
                queries: DataFrame, dim: Int, m: Int, k: Int, nprobe: Int): DataFrame =
    ivfPqTopKImpl(assignedCodes, codebooks, centroids, queries, dim, m, k, nprobe,
      broadcastLut = true)

  /** IVF-PQ top-k for LARGE query sets — the [[Ivf.searchLarge]] analogue
    * of [[ivfPqTopK]]: the per-query ADC lookup table is NOT broadcast;
    * candidates (probed-cell equi-join rows) and the LUT both shuffle on
    * (qid, sub, code), so no side has to fit in broadcast or driver
    * memory. Nothing is broadcast but the centroids and codebooks (k·m
    * rows each). Bit-identical results to [[ivfPqTopK]] (spec-asserted).
    */
  def ivfPqTopKLarge(assignedCodes: DataFrame, codebooks: DataFrame, centroids: DataFrame,
                     queries: DataFrame, dim: Int, m: Int, k: Int, nprobe: Int): DataFrame =
    ivfPqTopKImpl(assignedCodes, codebooks, centroids, queries, dim, m, k, nprobe,
      broadcastLut = false)

  private def ivfPqTopKImpl(assignedCodes: DataFrame, codebooks: DataFrame, centroids: DataFrame,
                            queries: DataFrame, dim: Int, m: Int, k: Int, nprobe: Int,
                            broadcastLut: Boolean): DataFrame = {
    val subDim = dim / m
    val probed = Ivf.probesAgg(queries, centroids, nprobe, Distances.l2)
    val lut0 = queries.crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub"), col("cid").as("code"),
        Distances.sqDist(
          slice(Distances.toDouble(col("vector")), col("sub") * lit(subDim) + lit(1), lit(subDim)),
          col("cvector")).as("d2"))
    val lut = if (broadcastLut) broadcast(lut0) else lut0
    val candidates = assignedCodes
      .join(probed, Seq("cid"))
      .select(col("qid"), col("id"), posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = candidates
      .join(lut, Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2")).as("d2sum"))
      .select(col("qid"), col("id"), sqrt(col("d2sum")).as("dist"))
    scored.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** IVF-PQ with exact refinement — the production read path: ADC over
    * codes prunes to `refine` candidates per query (cheap, code-only IO),
    * then ONLY those candidates' true vectors are fetched and re-scored
    * exactly. Per query the exact work is `refine` distance evaluations
    * instead of n — the float column is touched for a few dozen rows.
    * Out: (qid, rank, id, dist) with exact distances.
    */
  def ivfPqTopKRefined(assignedCodes: DataFrame, codebooks: DataFrame, centroids: DataFrame,
                       queries: DataFrame, vectors: DataFrame,
                       dim: Int, m: Int, k: Int, nprobe: Int, refine: Int = 50): DataFrame = {
    val coarse = ivfPqTopK(assignedCodes, codebooks, centroids, queries, dim, m, refine, nprobe)
      .select(col("qid"), col("id"))
    val rescored = coarse
      .join(vectors.select(col("id"), col("vector").as("i_vector")), "id")
      .join(broadcast(queries.select(col("qid"), col("vector").as("q_vector"))), "qid")
      .select(col("qid"), col("id"),
        sqrt(Distances.sqDist(col("i_vector"), col("q_vector"))).as("dist"))
    rescored.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** Persisted IVF-PQ artifact: coarse centroids, per-sub-block codebooks,
    * the encoded corpus (id, cid, codes), and the (dim, m) geometry.
    */
  final case class IvfPqIndex(centroids: DataFrame, codebooks: DataFrame,
                              assignedCodes: DataFrame, dim: Int, m: Int)

  /** Persist a trained IVF-PQ artifact — the PQ twin of `Hnsw.save`: at
    * 100 TB the expensive parts (k-means training + corpus encoding) run
    * once and every later session loads parquet + a meta json instead of
    * retraining. Three parquet tables + meta.json.
    */
  def saveIvfPq(index: IvfPqIndex, dir: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    index.codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    index.assignedCodes.write.mode("overwrite").parquet(s"$dir/codes")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/meta.json"),
      s"""{"dim":${index.dim},"m":${index.m}}""")
  }

  /** Load a persisted IVF-PQ artifact; [[ivfPqTopK]] / [[ivfPqTopKLarge]] /
    * [[ivfPqTopKRefined]] run directly over the loaded tables
    * (spec-asserted identical results across the round-trip).
    */
  def loadIvfPq(spark: org.apache.spark.sql.SparkSession, dir: String): IvfPqIndex = {
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/meta.json"))
    def field(name: String): Int =
      s""""$name"\\s*:\\s*([0-9]+)""".r.findFirstMatchIn(raw)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(s"meta.json missing '$name' in $dir"))
    IvfPqIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/codes"),
      dim = field("dim"), m = field("m"))
  }

  // ---- byte-code scan path (the decayed high-dim regime's PQ form) ----

  /** The trained codebooks flattened to ONE [sub][cid][d] array row —
    * data, not plan (a 131k-element literal would explode codegen). Used
    * as the broadcast side of the byte encoder and the LUT builders.
    */
  def codebooksFlatDf(codebooks: DataFrame): DataFrame =
    codebooks.groupBy()
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cid"), col("cvector")))),
        s => s.getField("cvector"))).as("cb_flat"))

  /** Encode to BINARY codes (one byte per sub-block, k ≤ 256) in a single
    * codegen'd pass — no explode, no join: (id, codes: binary). The 32×
    * scan-footprint cut vs the float vectors is the point of PQ at 100 TB;
    * array&lt;long&gt; codes ([[pqEncode]]) keep the relational/oracle
    * form but squander 8× of it. Extra columns (e.g. pid) pass through.
    */
  def pqEncodeBytes(vectors: DataFrame, codebooks: DataFrame, m: Int): DataFrame = {
    val flat = codebooksFlatDf(codebooks)
    vectors.crossJoin(broadcast(flat))
      .withColumn("codes",
        org.apache.spark.sql.graft.PqExpressions.pqEncodeBytes(col("vector"), col("cb_flat"), m))
      .drop("cb_flat", "vector")
  }

  /** Per-query flat ADC lookup tables, [sub][cid] float arrays:
    * (qid, lut) with lut(sub·k + cid) = `term` of the query's sub-slice
    * against that cell. Float entries halve the broadcast (the exact
    * rescore downstream absorbs the precision trade).
    */
  private def queryLut(queries: DataFrame, codebooks: DataFrame, subDim: Int,
                       term: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): DataFrame =
    queries.crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub"), col("cid"),
        term(slice(Distances.toDouble(col("vector")), col("sub") * lit(subDim) + lit(1), lit(subDim)),
          col("cvector")).as("v"))
      .groupBy(col("qid"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cid"), col("v")))),
        s => s.getField("v").cast("float")).as("lut"))

  /** ADC coarse scan + exact rescore over BYTE codes — the decayed-regime
    * read path ([[graft.hnsw.Hnsw]]'s PQ tier). One codegen'd
    * broadcast-nested-loop pass scores every (query, code row) pair at m
    * table loads instead of dim multiply-adds over a 32×-smaller scan
    * (5M×512 at m=64: 320 MB of codes vs 10 GB of vectors), keeps the
    * per-query top-`refine` (bounded heaps, map-side), then rescores ONLY
    * those candidates' true vectors with the exact metric — output
    * distances are exact, recall is the probability the true top-k
    * survives the ADC top-refine cut.
    *
    * Metrics: "l2" (ADC = √Σ‖q⁽ˢ⁾−c⁽ˢ⁾‖²) and "cosine"
    * (1 − Σdot / (‖q‖·√Σ‖c⁽ˢ⁾‖²), zero-norm → 1.0 — the F2 contract;
    * the cell-norm² LUT is query-independent and built once). Query-batch
    * contract: the per-query LUT broadcast is q·m·k floats — bounded
    * batches (~4k queries at m=64·k=256 inside 256 MB).
    * Output: (qid, rank, id, dist), dist exact.
    */
  def pqScanRefined(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
                    vectors: DataFrame, dim: Int, m: Int, k: Int,
                    refine: Int = -1, metric: String = "l2"): DataFrame = {
    require(metric == "l2" || metric == "cosine", s"pqScanRefined: unknown metric '$metric'")
    val subDim = dim / m
    val r = if (refine > 0) math.max(refine, k) else math.max(20 * k, 100)
    val q = queries.select(col("qid").cast("long").as("qid"),
      col("vector").cast("array<float>").as("vector"))
    val adcExpr =
      if (metric == "l2") {
        val lut = queryLut(q, codebooks, subDim, (a, b) => Distances.sqDist(a, b))
        codes.crossJoin(broadcast(lut))
          .select(col("qid"), col("id"),
            sqrt(org.apache.spark.sql.graft.PqExpressions.adcSum(col("codes"), col("lut"))).as("dist"))
      } else {
        // dot LUT per query; cell-norm² LUT query-independent (one row)
        val dotLut = queryLut(q, codebooks, subDim, (a, b) => Distances.dot(a, b))
          .join(q.select(col("qid"), Distances.norm(col("vector")).as("q_norm")), "qid")
        val norm2 = codebooks.groupBy()
          .agg(transform(array_sort(collect_list(struct(col("sub"), col("cid"),
              Distances.dot(col("cvector"), col("cvector")).as("n2")))),
            s => s.getField("n2").cast("float")).as("norm2_lut"))
        val dotSum = org.apache.spark.sql.graft.PqExpressions.adcSum(col("codes"), col("lut"))
        val xNorm = sqrt(org.apache.spark.sql.graft.PqExpressions.adcSum(col("codes"), col("norm2_lut")))
        codes.crossJoin(broadcast(dotLut)).crossJoin(broadcast(norm2))
          .select(col("qid"), col("id"),
            when(col("q_norm") === 0.0 || xNorm === 0.0, lit(1.0))
              .otherwise(lit(1.0) - dotSum / (col("q_norm") * xNorm)).as("dist"))
      }
    // dedup heap: a spill-ghost code row (same id in two shards) must not
    // occupy two of the refine slots
    val coarse = adcExpr.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), r).as("top"))
      .select(col("qid"), explode(col("top")("id")).as("id"))
    val distFn = Distances.metric(metric)
    val rescored = vectors.select(col("id"), col("vector").as("i_vector"))
      .join(broadcast(coarse), Seq("id"))
      .join(broadcast(q.select(col("qid"), col("vector").as("q_vector"))), Seq("qid"))
      .select(col("qid"), col("id"), distFn(col("i_vector"), col("q_vector")).as("dist"))
    rescored.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** [[pqScanRefined]] with the coarse ADC stage as a BATCHED KERNEL —
    * one `mapPartitions` pass over the byte codes scoring every query in
    * a tight primitive loop, with per-(partition, query) bounded
    * max-heaps and a fast-reject against the heap root before any
    * insert. Same math as the codegen'd [[org.apache.spark.sql.graft
    * .PqExpressions]] AdcSum path (float LUT loads accumulated
    * left-to-right in double — bit-identical sums), but the per-pair
    * work is a TILED JVM array loop (row-chunk × query, one LUT
    * cache-resident per chunk pass) instead of a Catalyst BNLJ row
    * iteration + ObjectHashAggregate update. The r13 measurements
    * (BENCH_SCALE_PQ512_KERNEL.json, capped 5M×512 index) revised r12's
    * diagnosis: the binding constraint was LUT GATHER LOCALITY, not
    * Catalyst iteration — the untiled kernel (query-inner loop, 64 MB of
    * LUTs cycled per row at 1,000 queries) only matched the expression
    * path, while the tiled loop beats the exact float scan outright
    * (131.5 s vs 187.3 s at 1,000 q refine=3200, recall@10 0.961).
    *
    * Same output contract as [[pqScanRefined]] ((qid, rank, id, dist),
    * dist exact after the rescore) and the same bounded-query contract —
    * the LUTs are collected (q·m·k floats, ~64 KB per query at
    * m=64·k=256) and ship once per task via broadcast. Candidates per
    * partition are capped at q·refine rows, so the merge shuffle is
    * O(q·refine·P) regardless of corpus size.
    */
  def pqScanRefinedKernel(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
                          vectors: DataFrame, dim: Int, m: Int, k: Int,
                          refine: Int = -1, metric: String = "l2"): DataFrame = {
    require(metric == "l2" || metric == "cosine", s"pqScanRefinedKernel: unknown metric '$metric'")
    val spark = codes.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val r = if (refine > 0) math.max(refine, k) else math.max(20 * k, 100)
    val q = queries.select(col("qid").cast("long").as("qid"),
      col("vector").cast("array<float>").as("vector"))
    val isCos = metric == "cosine"
    val lutTerm: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (isCos) (a, b) => Distances.dot(a, b) else (a, b) => Distances.sqDist(a, b)
    val luts: Array[(Long, Array[Float])] =
      queryLut(q, codebooks, subDim, lutTerm).collect()
        .map(row => (row.getLong(0), row.getSeq[Float](1).toArray))
    val qNorms: Map[Long, Double] =
      if (isCos)
        q.select(col("qid"), Distances.norm(col("vector")).as("n")).collect()
          .map(row => row.getLong(0) -> row.getDouble(1)).toMap
      else Map.empty
    val norm2: Array[Float] =
      if (isCos)
        codebooks.groupBy()
          .agg(transform(array_sort(collect_list(struct(col("sub"), col("cid"),
              Distances.dot(col("cvector"), col("cvector")).as("n2")))),
            s => s.getField("n2").cast("float")).as("norm2_lut"))
          .head().getSeq[Float](0).toArray
      else Array.emptyFloatArray
    val bc = spark.sparkContext.broadcast((luts, qNorms, norm2))
    val mV = m
    val rV = r
    // parallelism pin: the codes table is ~30× smaller than the floats
    // (the whole point), so a file-split scan of it coalesces into a
    // HANDFUL of input partitions (measured: 439 MB of codes at 5M×512 →
    // 4 splits → 4 of 32 cores busy, kernel 3× slower than the expression
    // path it should beat). One cheap round-robin shuffle of the slim
    // (id, codes) rows decouples kernel parallelism from file layout.
    val par = spark.sessionState.conf.numShufflePartitions
    val coarseRows = codes.select(col("id").cast("long").as("id"), col("codes"))
      .as[(Long, Array[Byte])]
      .repartition(par)
      .mapPartitions { it =>
        val (ls, qn, n2) = bc.value
        val nq = ls.length
        val kc = if (nq > 0) ls(0)._2.length / mV else 0
        // query norms as a position-aligned primitive array — a boxed-Long
        // Map lookup per (row, query) pair costs more than the 64 adds it
        // accompanies
        val qnArr = if (qn.isEmpty) null else ls.map(l => qn(l._1))
        // per-query bounded MAX-heaps (root = current worst kept dist)
        val hD = Array.fill(nq)(new Array[Double](rV))
        val hI = Array.fill(nq)(new Array[Long](rV))
        val sz = new Array[Int](nq)
        def siftDown(qi: Int, start: Int): Unit = {
          val d = hD(qi); val ids = hI(qi); val nEl = sz(qi)
          var i = start
          while (true) {
            val l = 2 * i + 1; val rr = 2 * i + 2
            var big = i
            if (l < nEl && d(l) > d(big)) big = l
            if (rr < nEl && d(rr) > d(big)) big = rr
            if (big == i) return
            val td = d(i); d(i) = d(big); d(big) = td
            val ti = ids(i); ids(i) = ids(big); ids(big) = ti
            i = big
          }
        }
        def push(qi: Int, dist: Double, id: Long): Unit = {
          val d = hD(qi); val ids = hI(qi)
          if (sz(qi) < rV) {
            var i = sz(qi); d(i) = dist; ids(i) = id; sz(qi) += 1
            while (i > 0 && d((i - 1) / 2) < d(i)) {
              val par = (i - 1) / 2
              val td = d(par); d(par) = d(i); d(i) = td
              val ti = ids(par); ids(par) = ids(i); ids(i) = ti
              i = par
            }
          } else if (dist < d(0)) {
            d(0) = dist; ids(0) = id; siftDown(qi, 0)
          }
        }
        // TILED (row-chunk × query) loop. The naive query-inner loop
        // touches every query's 64 KB LUT per ROW — at 1,000 queries that
        // is a 64 MB working set cycled 6.5M times, and the gathers fall
        // out of every cache level (measured: ADC coarse LOST to the
        // sequential float scan, 213.6 s vs 167.9 s at 5M×512/1000 q).
        // Buffering a chunk of rows and iterating query-outer/row-inner
        // keeps ONE LUT L1/L2-resident for the whole chunk pass; the codes
        // chunk (8192 × m bytes = 512 KB) streams linearly. Accumulation
        // order per (row, query) is unchanged — results stay bit-identical.
        val CHUNK = 8192
        val cIds = new Array[Long](CHUNK)
        val cCodes = new Array[Array[Byte]](CHUNK)
        val cXn = new Array[Double](CHUNK)
        while (it.hasNext) {
          var nRows = 0
          while (it.hasNext && nRows < CHUNK) {
            val (id, cs) = it.next()
            cIds(nRows) = id; cCodes(nRows) = cs
            // the code self-norm Σ‖c_sub‖² is QUERY-INDEPENDENT — one
            // gather pass per row, not one per (row, query)
            if (n2.length > 0) {
              var s2 = 0.0
              var sub = 0
              while (sub < mV) { s2 += n2(sub * kc + (cs(sub) & 0xFF)).toDouble; sub += 1 }
              cXn(nRows) = math.sqrt(s2)
            }
            nRows += 1
          }
          var qi = 0
          while (qi < nq) {
            val lut = ls(qi)._2
            val qq = if (n2.length > 0) qnArr(qi) else 0.0
            var r = 0
            while (r < nRows) {
              val cs = cCodes(r)
              var s = 0.0
              var sub = 0
              while (sub < mV) {
                s += lut(sub * kc + (cs(sub) & 0xFF)).toDouble
                sub += 1
              }
              val dist =
                if (n2.length > 0) {
                  val xn = cXn(r)
                  if (qq == 0.0 || xn == 0.0) 1.0 else 1.0 - s / (qq * xn)
                } else math.sqrt(s)
              if (sz(qi) < rV || dist < hD(qi)(0)) push(qi, dist, cIds(r))
              r += 1
            }
            qi += 1
          }
        }
        Iterator.range(0, nq).flatMap { qi =>
          Iterator.range(0, sz(qi)).map(j => (ls(qi)._1, hI(qi)(j), hD(qi)(j)))
        }
      }.toDF("qid", "id", "dist")
    // global merge with the dedup heap (cross-partition union + spill
    // ghosts), then the same exact rescore as pqScanRefined
    val coarse = coarseRows.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), r).as("top"))
      .select(col("qid"), explode(col("top")("id")).as("id"))
    val distFn = Distances.metric(metric)
    val rescored = vectors.select(col("id"), col("vector").as("i_vector"))
      .join(broadcast(coarse), Seq("id"))
      .join(broadcast(q.select(col("qid"), col("vector").as("q_vector"))), Seq("qid"))
      .select(col("qid"), col("id"), distFn(col("i_vector"), col("q_vector")).as("dist"))
    rescored.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** Reconstruct (id, vector: array&lt;double&gt;) from codes + codebooks —
    * concatenation of each sub-block's centroid. Used for recall/error
    * evaluation and asymmetric-distance rescoring.
    */
  def pqDecode(codes: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    codes
      .select(col("id"), posexplode(col("codes")).as(Seq("sub", "cid")))
      .join(broadcast(codebooks), Seq("sub", "cid"))
      .groupBy(col("id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("sub"), col("cvector")))),
        s => s.getField("cvector"))).as("vector"))
}
