package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Product quantization — the canonical 100 TB ANN memory layout (IVF-PQ):
  * the vector is split into `m` contiguous sub-blocks, each sub-block gets
  * its own k-cell codebook (Lloyd's k-means, [[Ivf.kmeansFit]]), and a
  * vector is stored as `m` small cell ids (m bytes at k ≤ 256 — a 256×
  * footprint cut for a 512-dim float32 embedding at m=8).
  *
  * Scale design: training fans out as m independent k-means runs over the
  * sliced column (each run shuffles k·subDim rows per iteration, never the
  * data); encoding is m broadcast-assign passes unioned and re-grouped by
  * id — the big table is scanned per sub-block but never shuffled except
  * for the final O(n) code assembly. Codes are deterministic given the
  * trained codebooks (min(struct) tie-break by cell id).
  */
object Pq {

  /** Train per-sub-block codebooks: (sub, cid, cvector) with cvector of
    * length dim/m. `dim` must be divisible by `m`.
    */
  def pqFit(vectors: DataFrame, dim: Int, m: Int, k: Int, iters: Int = 3): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val subDim = dim / m
    (0 until m).map { j =>
      val sub = vectors.select(col("id"),
        slice(col("vector"), j * subDim + 1, subDim).as("vector"))
      Ivf.kmeansFit(sub, k, iters).select(lit(j).as("sub"), col("cid"), col("cvector"))
    }.reduce(_ unionByName _)
  }

  /** Encode: (id, codes: array&lt;long&gt; of length m) — codes[j] is the
    * nearest cell of sub-block j's codebook.
    */
  def pqEncode(vectors: DataFrame, codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    (0 until m).map { j =>
      val sub = vectors.select(col("id"),
        slice(col("vector"), j * subDim + 1, subDim).as("vector"))
      val cb = codebooks.filter(col("sub") === j).select(col("cid"), col("cvector"))
      Ivf.assign(sub, cb, Distances.l2)
        .select(col("id"), lit(j).as("sub"), col("cid"))
    }.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cid")))),
        s => s.getField("cid")).as("codes"))
  }

  /** ADC (asymmetric distance) top-k over PQ codes: per query, a lookup
    * table of squared distances from each query sub-vector to every
    * codebook cell (|q|·m·k rows — tiny — broadcast), joined to the
    * exploded code table and partial-agg summed per (query, vector), then
    * the bounded-heap top-k. The original vectors are never read: the scan
    * is m longs per row instead of `dim` floats — the point of PQ at
    * 100 TB. Output: (qid, rank, id, dist) with dist = √Σⱼ‖q⁽ʲ⁾−c⁽ʲ⁾‖².
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
    * @param assignedCodes (id, cid, codes) — each vector's coarse cell and
    *                      PQ codes (from [[Ivf.assign]] + [[pqEncode]])
    */
  def ivfPqTopK(assignedCodes: DataFrame, codebooks: DataFrame, centroids: DataFrame,
                queries: DataFrame, dim: Int, m: Int, k: Int, nprobe: Int): DataFrame = {
    val subDim = dim / m
    val probed = Ivf.probesAgg(queries, centroids, nprobe, Distances.l2)
    val lut = queries.crossJoin(broadcast(codebooks))
      .select(col("qid"), col("sub"), col("cid").as("code"),
        Distances.sqDist(
          slice(Distances.toDouble(col("vector")), col("sub") * lit(subDim) + lit(1), lit(subDim)),
          col("cvector")).as("d2"))
    val candidates = assignedCodes
      .join(probed, Seq("cid"))
      .select(col("qid"), col("id"), posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = candidates
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2")).as("d2sum"))
      .select(col("qid"), col("id"), sqrt(col("d2sum")).as("dist"))
    scored.groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
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
