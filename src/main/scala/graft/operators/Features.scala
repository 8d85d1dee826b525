package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic text feature generation — the classical, model-free
  * stand-in for learned embeddings (torch embedding generation is declared
  * out of scope; cf. SURVEY §2.6): hashed bag-of-words vectors and exact
  * cosine similarity search over them. Everything here is md5 + integer
  * arithmetic + one final exact double op, so a DuckDB oracle reproduces
  * features AND similarity rankings bit-for-bit — which is what lets the
  * full documents → features → top-k pipeline sit in the correctness gate
  * rather than being spec-only like the learned-vector paths.
  */
object Features {

  /** Hashed bag-of-words features in sparse (id, bucket, tf) form: each
    * token hashes to one of `dim` buckets (32-bit md5 prefix mod dim — the
    * [[Sampling.idHash]] family), tf = token count in the bucket. Sparse
    * rows, not arrays: at 100 TB an `Array(dim)` per doc materializes
    * dim × docs cells regardless of occupancy, while sparse rows shuffle
    * only what exists, partial-aggregate map-side, and feed joins/aggs
    * directly (the dense form is one `groupBy(id).pivot` away when a
    * small-dim model table is genuinely needed).
    */
  def hashedBow(docs: DataFrame, idCol: String, textCol: String, dim: Int = 256): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"), lit(dim.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF-weighted hashed BoW in sparse (id, bucket, tf, idf_fp, w_fp)
    * form — [[hashedBow]] with each bucket down-weighted by how many
    * documents hit it (the hashing-trick convention: document frequency
    * is computed per BUCKET, so collisions share one idf). The smoothed
    * idf `ln((N+1)/(df+1))` is fixed-pointed ONCE per distinct bucket to
    * micro-nat BIGINTs (the engine's accepted `ln` posture), making the
    * weight `w_fp = tf · idf_fp` and every downstream sum pure integer
    * arithmetic — order-independent at any parallelism, bit-exact in the
    * oracle.
    *
    * Scale shape: one extra vocabulary-sized partial agg (df per bucket,
    * ≤ dim rows) broadcast back onto the sparse rows; corpus count is a
    * 1-row broadcast. Nothing about the sparse-row discipline changes.
    */
  def tfidfBow(docs: DataFrame, idCol: String, textCol: String, dim: Int = 256): DataFrame = {
    val bow = hashedBow(docs, idCol, textCol, dim)
    val df_ = bow.groupBy(col("bucket")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("nd"))
    val idf = df_.crossJoin(broadcast(stats))
      .select(col("bucket"),
        floor(log((col("nd") + 1).cast("double") / (col("df") + 1)) *
          lit(1e6) + lit(0.5)).cast("long").as("idf_fp"))
    bow.join(broadcast(idf), "bucket")
      .select(col(idCol), col("bucket"), col("tf"), col("idf_fp"),
        (col("tf") * col("idf_fp")).as("w_fp"))
  }

  /** Densify sparse BoW rows into `(id, vector: array<float>)` — the
    * [[graft.hnsw.Hnsw.build]] input contract, connecting the text feature
    * pipeline to the ANN stack (text → hashedBow → densify → HNSW index →
    * annQuery). Purely relational scatter: the sparse entries collect into
    * a map (partial-agg `collect_list`), and a `transform(sequence(...))`
    * projection reads each dimension with a zero default — no UDF, no
    * driver materialization. Only use for MODEL-FACING dims (the dense
    * array costs dim cells per doc regardless of sparsity — that cost is
    * why [[hashedBow]] stays sparse for everything else).
    */
  def densify(bow: DataFrame, idCol: String, dim: Int): DataFrame =
    bow
      .groupBy(col(idCol).as("id"))
      .agg(map_from_entries(
        collect_list(struct(col("bucket").cast("int"), col("tf").cast("float")))).as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0f))).as("vector"))

  /** Exact top-k most similar documents to `queryId` by hashed-BoW cosine.
    * The query doc ranks itself first at similarity 1.0 — the reference's
    * golden-output self-match semantics (README.md:21-27, rank-1
    * self-match) in relational form.
    *
    * Exactness: dot products and squared norms are BIGINT sums of BIGINT
    * products — order-independent — and the only floating-point ops are
    * one product, one sqrt and one division in a fixed association, so
    * rankings (ties broken by id) reproduce across engines bit-for-bit.
    * The denominator is `sqrt(n2 · qn2)` rather than `sqrt(n2) · sqrt(qn2)`
    * deliberately: the latter makes self-similarity 1 + 1ulp
    * (sqrt(6)·sqrt(6) = 6.000000000000001), the former keeps the
    * self-match at exactly 1.0 whenever n2·qn2 stays within double's 2⁵³
    * integer range.
    *
    * Scale shape: the query vector (≤ dim rows) broadcasts to the sparse
    * feature table — the dot product is a broadcast equi-join on `bucket`
    * + one partial-agg sum, never a doc×doc comparison; norms are a
    * partial-agg groupBy; top-k is TakeOrdered. For query BATCHES, join
    * on bucket with a (qid, bucket, tf) table instead — same plan with one
    * more grouping key; the single-query form is the oracle-checked one.
    */
  /** Batch form of [[bowCosineTopK]]: top-k per query id through the
    * bounded-heap `TopKByDist` aggregate — map-side heaps keep the shuffle
    * at O(queries × k) rows per partition, never the q×n score matrix
    * (same machinery as [[Knn.exactTopK]]). Scores are COSINE DISTANCE
    * (1 − cosine), ascending — the vector stack's convention — computed
    * with the same BIGINT dot/norm exactness as the single-query form.
    * Output: (qid, rank, id, dist), ties broken by id.
    */
  def bowCosineTopKBatch(bow: DataFrame, idCol: String, queryIds: Seq[Long],
                         k: Int = 10): DataFrame = {
    val q = bow.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("bucket"), col("tf").as("qtf"))
    val dot = bow.join(broadcast(q), "bucket")
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("tf") * col("qtf")).as("dot"))
    val norms = bow.groupBy(col(idCol)).agg(sum(col("tf") * col("tf")).as("n2"))
    val qn = norms.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("n2").as("qn2"))
    val scored = dot
      .join(norms, idCol)
      .join(broadcast(qn), "qid")
      .select(col("qid"), col(idCol).as("id"),
        (lit(1.0) - col("dot").cast("double") /
          sqrt(col("n2").cast("double") * col("qn2").cast("double"))).as("dist"))
    scored
      .groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as(idCol), col("entry.dist").as("dist"))
  }

  def bowCosineTopK(bow: DataFrame, idCol: String, queryId: Long, k: Int = 10): DataFrame = {
    val q = bow.filter(col(idCol) === queryId)
      .select(col("bucket"), col("tf").as("qtf"))
    val dot = bow.join(broadcast(q), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("qtf")).as("dot"))
    val norms = bow.groupBy(col(idCol)).agg(sum(col("tf") * col("tf")).as("n2"))
    val qNorm = norms.filter(col(idCol) === queryId).select(col("n2").as("qn2"))
    dot
      .join(norms, idCol)
      .join(broadcast(qNorm))
      .select(col(idCol),
        (col("dot").cast("double") /
          sqrt(col("n2").cast("double") * col("qn2").cast("double"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-space outlier detection — the scrub pass that runs BEFORE
    * semantic dedup / diversity sampling: vectors far from the corpus
    * centroid are encoder failures, empty-input artifacts, or
    * off-distribution junk, and they poison both the dedup blocking and
    * any cluster-balanced sample. Flags rows whose squared distance to
    * the global centroid exceeds `threshold`.
    *
    * Everything is EXACT fixed-point integer arithmetic, so the decision
    * is reproducible at any parallelism and in a SQL oracle: each
    * component maps to `floor((x + offset) · 10⁶)` (one IEEE multiply on
    * the exactly-widened float, one floor — identical in any engine;
    * `offset` keeps values nonnegative so integer division below floors
    * identically everywhere), the centroid is the per-dimension integer
    * mean `Σfp DIV n` (offsets cancel in the differences), and d2_fp is
    * an integer sum of squared integer differences — order-free.
    *
    * Scale shape: the per-dimension sums partial-aggregate to `dim`
    * distinct keys per task before the shuffle (a `dim`-row exchange, not
    * n×dim); the centroid collapses to ONE broadcast array row; the
    * distance pass is a pure map-side `zip_with`/`aggregate` projection.
    * No corpus-sized shuffle anywhere. Out: (idCol, d2_fp, is_outlier).
    */
  def embeddingOutliers(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Long, offset: Double = 1.0): DataFrame = {
    val fpVec = transform(col(vecCol),
      x => floor((x.cast("double") + lit(offset)) * lit(1e6)).cast("long"))
    val base = emb.select(col(idCol), fpVec.as("fp"))
    val means = base.select(posexplode(col("fp")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("pos"), expr("s DIV n").as("m"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(transform(col("pm"), x => x("m")).as("means"))
    base.crossJoin(broadcast(means))
      .select(col(idCol),
        aggregate(zip_with(col("fp"), col("means"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2_fp"))
      .withColumn("is_outlier", (col("d2_fp") > threshold).cast("int"))
  }
}
