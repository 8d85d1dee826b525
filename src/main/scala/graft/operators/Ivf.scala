package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate similarity search — the bucketed scale
  * path for ANN over an embedding column (SURVEY.md "similarity search"
  * pipeline operator).
  *
  * Scale design: cell assignment is a map-side `min(struct(dist, cid))`
  * partial aggregate against broadcast centroids — the only shuffle is one
  * row per vector (its argmin), never the n×k score matrix. Search probes
  * `nprobe` cells per query, so the candidate join touches ~n·nprobe/k rows
  * instead of n, shuffled on the cell id (AQE handles hot cells).
  * Determinism: ties broken by centroid id via the struct's lexicographic
  * ordering, so results are reproducible and oracle-checkable.
  */
object Ivf {

  /** Lloyd's k-means over (id, vector) — trains the IVF centroid table
    * (cid, cvector). Deterministic given the input: init = the k lowest-id
    * vectors; each iteration is one broadcast-assign plus one partial-agg
    * per-(cell, dimension) mean (shuffle = k·dim rows, never the data).
    * Cells that empty out keep their previous centroid. Means are
    * order-dependent double sums, so this is spec-tested rather than
    * oracle-checked — training needs convergence, not bit-replay; the
    * *assignment* under the trained centroids is deterministic.
    *
    * `spillPath`: per-iteration centroids as durable parquet instead of
    * executor-local checkpoint blocks — on a real cluster an executor loss
    * mid-training then costs one task retry, not the whole fit (see
    * [[Checkpoints.materialize]]). Caller owns the dir for the lifetime of
    * the returned frame; superseded iterations are deleted as the loop
    * advances.
    */
  def kmeansFit(
      vectors: DataFrame,
      k: Int,
      iters: Int = 3,
      dist: (Column, Column) => Column = graft.functions.Distances.l2,
      spillPath: Option[String] = None): DataFrame = {
    import graft.functions.Distances
    def sub(i: Int): Option[String] = spillPath.map(root => s"$root/centroids_$i")
    val w = Window.orderBy(col("id").asc)
    var centroids = Checkpoints.materialize(
      vectors.orderBy(col("id").asc).limit(k)
        .select((row_number().over(w) - 1).cast("long").as("cid"),
          Distances.toDouble(col("vector")).as("cvector")),
      sub(0))
    for (i <- 1 to iters) {
      val means = assign(vectors, centroids, dist)
        .join(vectors, "id")
        .select(col("cid"), posexplode(Distances.toDouble(col("vector"))).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvector"))
      val superseded = centroids
      centroids = Checkpoints.materialize(
        centroids.select(col("cid"), col("cvector").as("prev"))
          .join(means, Seq("cid"), "left")
          .select(col("cid"), coalesce(col("cvector"), col("prev")).as("cvector")),
        sub(i))
      // the new materialization is complete; the previous iteration's copy
      // is unreachable — free it (only the LATEST centroids stay live)
      Checkpoints.release(superseded, sub(i - 1))
    }
    centroids
  }

  /** Lloyd's k-means whose TRAINING is cross-engine-exact — the clustering
    * twin of the repo's oracle-exact arithmetic posture. [[kmeansFit]] is
    * the fast float path, but float means are order-dependent, so only its
    * *assignment under given centroids* can be oracle-checked. Here every
    * quantity is an integer:
    *
    *  - points quantize once to fixed-point `qv = floor((x + offset) · scale)`
    *    (+offset keeps qv non-negative, so truncating and flooring integer
    *    division agree across engines; ·2²⁰ is exact double scaling);
    *  - distances are Σ(qv−cv)² in BIGINT (≤ 2⁵⁴ for dim-64 — no overflow);
    *  - assignment ties break by (dist, cid) lexicographic struct-min;
    *  - centroid updates are `sum DIV count` integer division; cells that
    *    empty keep their previous centroid (the [[kmeansFit]] contract).
    *
    * Representation is RELATIONAL — points exploded to (id, d, qv) — so
    * every step is a partial-agg groupBy/join Catalyst plans freely; the
    * per-iteration k·dim centroid table is materialized via
    * [[Checkpoints]] exactly like [[kmeansFit]] (durable under
    * `spillPath`, superseded iterations freed). Join fan-out is
    * points × k × dim rows — the standard relational k-means cost, fine
    * for curation-scale k; for large k use [[kmeansFit]]'s broadcast
    * form. Output: final assignment (id, cid, dist) with dist in
    * fixed-point squared units.
    */
  def kmeansExact(
      vectors: DataFrame,
      k: Int,
      iters: Int = 2,
      offset: Double = 4.0,
      scale: Long = 1L << 20,
      spillPath: Option[String] = None): DataFrame = {
    require(k > 0 && iters >= 0, s"kmeansExact: need k > 0, iters >= 0; got k=$k iters=$iters")
    def sub(i: Int): Option[String] = spillPath.map(root => s"$root/qcentroids_$i")
    val pts0 = vectors.select(col("id").cast("long").as("id"),
        posexplode(graft.functions.Distances.toDouble(col("vector"))).as(Seq("d", "x")))
      .select(col("id"), col("d"),
        floor((col("x") + lit(offset)) * lit(scale.toDouble)).cast("long").as("qv"))
    // r17: pts feeds init, every assignQ call AND every means join —
    // 2·iters+1+1 evaluations per action, each a full corpus scan +
    // posexplode. Checkpoint the quantized (id, d, qv) table once
    // (executor-local path only: the durable spillPath contract keeps
    // exactly the centroid iteration dirs, and its fault-tolerance story
    // is recompute-from-source)
    val pts = if (spillPath.isEmpty) Checkpoints.tracked(pts0) else pts0
    val w = Window.orderBy(col("id").asc)
    val init = vectors.select(col("id").cast("long").as("id"))
      .orderBy(col("id").asc).limit(k)
      .select((row_number().over(w) - 1).cast("long").as("cid"), col("id"))
    var cents = Checkpoints.materialize(
      pts.join(init, "id").select(col("cid"), col("d"), col("qv").as("cv")), sub(0))
    def assignQ(c: DataFrame): DataFrame =
      pts.join(c, Seq("d"))
        .groupBy("id", "cid")
        .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("dist"))
        .groupBy("id")
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("id"), col("best.cid").as("cid"), col("best.dist").as("dist"))
    for (i <- 1 to iters) {
      val means = assignQ(cents).join(pts, "id")
        .groupBy("cid", "d")
        .agg(expr("sum(qv) DIV count(1)").as("nv"))
      val superseded = cents
      cents = Checkpoints.materialize(
        cents.select(col("cid"), col("d"), col("cv").as("prev"))
          .join(means, Seq("cid", "d"), "left")
          .select(col("cid"), col("d"), coalesce(col("nv"), col("prev")).as("cv")),
        sub(i))
      Checkpoints.release(superseded, sub(i - 1))
    }
    assignQ(cents)
  }

  /** Assign each vector to its nearest centroid.
    * In: vectors (id, vector), centroids (cid, cvector). Out: (id, cid, dist).
    */
  def assign(
      vectors: DataFrame,
      centroids: DataFrame,
      dist: (Column, Column) => Column): DataFrame = {
    val scored = vectors
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("cid"), dist(col("vector"), col("cvector")).as("dist"))
    scored
      .groupBy("id")
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("id"), col("best.cid").as("cid"), col("best.dist").as("dist"))
  }

  /** The `nprobe` nearest centroids per query: (qid, cid). */
  def probes(
      queries: DataFrame,
      centroids: DataFrame,
      nprobe: Int,
      dist: (Column, Column) => Column): DataFrame = {
    val scored = queries
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("cid"), dist(col("vector"), col("cvector")).as("cdist"))
    val w = Window.partitionBy("qid").orderBy(col("cdist").asc, col("cid").asc)
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .select("qid", "cid")
  }

  /** The `nprobe` nearest centroids per query via the partial-aggregating
    * bounded heap — for LARGE query sets, where [[probes]]' window would
    * shuffle the full q×C score matrix. Shuffle is O(q × nprobe).
    */
  def probesAgg(
      queries: DataFrame,
      centroids: DataFrame,
      nprobe: Int,
      dist: (Column, Column) => Column): DataFrame = {
    val scored = queries
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("cid"), dist(col("vector"), col("cvector")).as("cdist"))
    scored.groupBy("qid")
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("cdist"), col("cid"), nprobe).as("top"))
      .select(col("qid"), explode(col("top")).as("e"))
      .select(col("qid"), col("e.id").as("cid"))
  }

  /** IVF top-k for a LARGE query set (e.g. an all-pairs kNN-join, where the
    * query side is as big as the index side): both sides shuffle on the
    * probed cell id — a plain equi-join, nothing broadcast but the
    * centroids — and the per-query top-k is the partial-aggregating bounded
    * heap. Candidate volume is Σ probed-cell sizes (~n·nprobe/C), never
    * n×q. Out: (qid, rank, id, dist).
    */
  def searchLarge(
      assigned: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      dist: (Column, Column) => Column): DataFrame = {
    val probed = probesAgg(queries, centroids, nprobe, dist)
    val qSide = probed.join(queries.select(col("qid"), col("vector").as("q_vector")), "qid")
    val candidates = assigned
      .select(col("id"), col("vector").as("i_vector"), col("cid"))
      .join(qSide, "cid")
      .select(col("qid"), col("id"), dist(col("i_vector"), col("q_vector")).as("dist"))
    candidates.groupBy("qid")
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** IVF top-k search: score only vectors in the probed cells.
    * In: assigned (id, vector, cid) — vectors carrying their cell id.
    * Out: (qid, rank, id, dist).
    */
  def search(
      assigned: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      dist: (Column, Column) => Column): DataFrame = {
    val probed = probes(queries, centroids, nprobe, dist)
    // (qid, cid, q_vector) is queries × nprobe rows — broadcast it so the
    // big assigned side never shuffles (statically invisible to the
    // planner, which would otherwise sort-merge on cid)
    val probeSide = broadcast(
      probed.join(queries.select(col("qid"), col("vector").as("q_vector")), "qid"))
    val candidates = assigned
      .select(col("id"), col("vector").as("i_vector"), col("cid"))
      .join(probeSide, "cid")
      .select(col("qid"), col("id"), dist(col("i_vector"), col("q_vector")).as("dist"))
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "dist")
  }
}
