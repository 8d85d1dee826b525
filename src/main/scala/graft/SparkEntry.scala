package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Distances, Levels, TextFunctions}
import graft.hnsw.{Hnsw, HnswParams}
import graft.operators.{Dedup, Ivf, Knn}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query keeps its floating-point arithmetic
  * bit-identical to the DuckDB SQL in [[oracleSql]] (see [[OracleSql]] for
  * the contract), so the driver's hash compare is exact with no rounding.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** embeddings table prepared as the vector index: (id, vector, label).
    * Float arrays go straight to the native distance expressions, which
    * widen per element — bit-identical to a double-cast pass, minus the
    * per-row transform.
    */
  private def emb(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings").select(
      col("vec_id").as("id"),
      col("embedding").as("vector"),
      col("label"))

  private val EmbDim = 64

  /** Fixed term query for the BM25 / hybrid-retrieval oracle rows: one
    * rare term (high idf) + two common ones, all present in the synthetic
    * vocabulary at every SF.
    */
  private val Bm25Terms = Seq("dup", "spark", "window")

  /** Fixed (qid, term) batch for q84 — overlapping vocabularies so docs
    * land in several queries' top-k with different scores.
    */
  private val Bm25BatchQueries = Seq(
    (0, "dup"), (0, "spark"), (1, "window"), (1, "merge"), (2, "dup"))

  /** Fixed phrase query for q87 — one near-unique bigram + two
    * mid-frequency ones (exact contiguous matching).
    */
  private val Bm25Phrases = Seq("dup dup", "spark window", "key value")

  /** "Curated" seed sources for the Naive-Bayes quality filter (q101/q102)
    * — the fixed stand-in for the WebText-like positive corpus in the
    * GPT-3-style curated-vs-crawl classifier. Arbitrary but frozen:
    * labels are configuration, not inference.
    */
  private val NbCurated = Seq("src0", "src3", "src7", "src11", "src15")

  private def nbCuratedSql: String =
    NbCurated.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Labeled NB seed: even doc_ids (the training half, as q100 does),
    * cls = 1 for curated sources.
    */
  private def nbTrain(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      .withColumn("cls", col("source").isin(NbCurated: _*).cast("int"))

  /** q119's planted ingest split, shared by q119 (the verdicts) and q120
    * (the token-budget decision over them): corpus = 80% of documents,
    * new batch = the 20% held out plus a re-crawled (near-dup) slice.
    */
  private def q119Verdicts(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 >= 2).select("doc_id", "text")
    val recrawled = docs.filter(col("doc_id") % 10 >= 2 && col("doc_id") % 50 === 7)
      .select((col("doc_id") + lit(10000L)).as("doc_id"), col("source"), col("text"))
    val newBatch = docs.filter(col("doc_id") % 10 < 2)
      .select("doc_id", "source", "text").unionAll(recrawled)
    graft.operators.Pipeline.prepareVerdicts(newBatch, corpus, "doc_id", "source", "text",
      minQuality = 0.3, n = 3, minJaccard = 0.2, maxDf = 5)
  }

  /** q120's per-source token quota — sized so that at sf0.01 some sources
    * overflow it (keep = 0 rows exist) while every source keeps its best
    * bin (keep = 1 rows exist): the decision boundary is exercised in both
    * directions.
    */
  private val Q120Quota = 150L

  /** events table with `ts` normalized to epoch microseconds (`tus`),
    * schema-dispatched: the driver has shipped `events.parquet` both as
    * parquet TIMESTAMP(NANOS) — which `spark.sql.legacy.parquet.nanosAsLong`
    * surfaces as a long — and as `timestamp[us]` (isAdjustedToUTC=false),
    * which Spark reads as TIMESTAMP_NTZ. Both encodings must resolve.
    * NTZ goes through a TimestampType cast under the UTC session zone, so
    * the literal value is preserved — matching DuckDB's `epoch_us(ts)`.
    * Integer arithmetic from here on: exact at any parallelism.
    */
  private def eventsMicros(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val e = tbl(s, dir, "events")
    val tus = e.schema("ts").dataType match {
      case LongType         => expr("ts DIV 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType    => unix_micros(col("ts"))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported type $other (expected long nanos or timestamp)")
    }
    e.withColumn("tus", tus)
  }

  /** One HNSW build per data dir, shared by the hnsw_* queries (edges
    * cached — the graph is reused, not rebuilt, per downstream action).
    */
  /** One BPE training run per data dir, shared by q79 (the merge table)
    * and q80 (the segmenter) — same lifecycle as [[indexCache]]. The
    * collected rows are tiny (merges=5).
    */
  private val bpeCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, String, String, Long)]]
  private def trainedMerges(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    bpeCache.getOrElseUpdate(dir,
      graft.operators.TextStats.bpeTrainMerges(tbl(s, dir, "documents"), "text", merges = 5)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq)
  // NOTE: bpeTrainMerges releases its loop checkpoints itself and the cache
  // stores collected ROWS, so no pinned{} needed here.

  private val indexCache = scala.collection.concurrent.TrieMap.empty[String, graft.hnsw.HnswIndex]
  private def builtIndex(s: SparkSession, dir: String): graft.hnsw.HnswIndex =
    indexCache.getOrElseUpdate(dir, graft.operators.Checkpoints.pinned {
      // pinned: frames reachable from this cache outlive any single query —
      // releaseTracked between bench queries must not touch them
      val input = tbl(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vector"))
      val idx = Hnsw.build(input, HnswParams(dim = EmbDim, m = 8, efConstruction = 64, numPartitions = 8))
      idx.copy(edges = idx.edges.cache())
    })

  /** Locality-sharded (routed) build per data dir — [[builtIndex]]'s twin
    * for the centroid-routed query path.
    */
  private val routedCache = scala.collection.concurrent.TrieMap.empty[String, graft.hnsw.HnswIndex]
  private def routedIndex(s: SparkSession, dir: String): graft.hnsw.HnswIndex =
    routedCache.getOrElseUpdate(dir, graft.operators.Checkpoints.pinned {
      // pinned: the routing table is an eager checkpoint that must survive
      // for the cache's lifetime (a localCheckpoint cannot recompute)
      val input = tbl(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vector"))
      val idx = Hnsw.buildRouted(input,
        HnswParams(dim = EmbDim, m = 8, efConstruction = 64, numPartitions = 8))
      idx.copy(edges = idx.edges.cache())
    })

  /** IVF-PQ artifacts per data dir (centroids, codebooks, assigned codes),
    * trained once and shared by the ivfpq_* queries — mirrors
    * [[builtIndex]]'s reuse pattern.
    */
  private val ivfpqCache =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame, DataFrame)]
  private def ivfpqArtifacts(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    ivfpqCache.getOrElseUpdate(dir, graft.operators.Checkpoints.pinned {
      val e = emb(s, dir).select("id", "vector")
      val centroids = Ivf.kmeansFit(e, k = 16, iters = 2)
      val codebooks = graft.operators.Pq.pqFit(e, EmbDim, m = 8, k = 16, iters = 2)
      val assignedCodes = Ivf.assign(e, centroids, Distances.l2).select("id", "cid")
        .join(graft.operators.Pq.pqEncode(e, codebooks, EmbDim, m = 8), "id")
        .localCheckpoint()
      (centroids, codebooks, assignedCodes)
    })

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's CIFAR ranked-report experience (SURVEY.md Q8): exact
    * top-k with labels and query-row marker.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val e = emb(spark, dir)
    val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
    val labels = e.select(col("id"), concat(lit("class_"), col("label")).as("label_name"))
    Knn.rankedReport(e, queries, labels, 5, Distances.l2)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- F1: L2 distance projection (hsnw_trial.py:44-45) ----
    "q01_l2_project" -> ((s, dir) => {
      val a = array(col("l_quantity"), col("l_extendedprice") / lit(1000.0),
        col("l_discount") * lit(10.0), col("l_tax") * lit(10.0))
      val b = array(lit(25.0), lit(30.0), lit(2.5), lit(0.4))
      tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        Distances.l2(a, b).as("dist"))
    }),

    // ---- F2: cosine distance incl. zero-norm → 1.0 (hsnw_trial.py:48-54) ----
    "q02_cosine_project" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("id") === 0).select(col("vector").as("q_vector"))
      e.crossJoin(broadcast(q))
        .select(col("id"), Distances.cosine(col("vector"), col("q_vector")).as("dist"))
    }),

    // ---- Q1a: exact brute-force top-k per query (hsnw_trial.py:267-294 oracle form) ----
    "q03_knn_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      Knn.exactTopK(e, queries, 10, Distances.l2)
    }),

    // ---- Q4: ORDER BY dist LIMIT k → TakeOrderedAndProject (hsnw_trial.py:292-293) ----
    "q04_order_limit" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("id") === 0).select(col("vector").as("q_vector"))
      val scored = e.crossJoin(broadcast(q))
        .select(col("id"), Distances.l2(col("vector"), col("q_vector")).as("dist"))
      Knn.topK(scored, 10)
    }),

    // ---- Q8 + D6: rank-annotated report with broadcast label join ----
    "q05_rank_label_report" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      val labels = e.select(col("id"), concat(lit("class_"), col("label")).as("label_name"))
      Knn.rankedReport(e, queries, labels, 5, Distances.l2)
    }),

    // ---- D5: validation filter (dim + null check, hsnw_trial.py:199-200) ----
    "q06_filter_valid" -> ((s, dir) =>
      tbl(s, dir, "embeddings")
        .filter(col("embedding").isNotNull && size(col("embedding")) === EmbDim)
        .select("vec_id")),

    // ---- M1 + Q3: tombstone filter pushed to the scan ----
    "q07_tombstone_filter" -> ((s, dir) =>
      tbl(s, dir, "embeddings")
        .withColumn("tombstone", col("vec_id") % 97 === 0)
        .filter(!col("tombstone"))
        .select("vec_id")),

    // ---- B6: entry-point maintenance (argmax by level, hsnw_trial.py:261-263) ----
    "q08_entry_point" -> ((s, dir) =>
      tbl(s, dir, "embeddings")
        .select(col("vec_id"), Levels.levelFor(col("vec_id"), Levels.defaultML(16)).as("level"))
        .orderBy(col("level").desc, col("vec_id").asc)
        .limit(1)),

    // ---- F4: deterministic level sampling distribution ----
    "q09_level_hist" -> ((s, dir) =>
      tbl(s, dir, "embeddings")
        .select(Levels.levelFor(col("vec_id"), Levels.defaultML(16)).as("level"))
        .groupBy("level").agg(count(lit(1)).as("cnt"))),

    // ---- exact dedup: canonical id per fingerprint ----
    "q10_dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(tbl(s, dir, "documents"), "doc_id", "text")),

    // ---- MinHash signatures over word 3-gram shingles ----
    "q11_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(tbl(s, dir, "documents"), "doc_id", "text", n = 3, h = 4)),

    // ---- LSH banding: candidate pairs via band-key equi-join ----
    "q12_lsh_pairs" -> ((s, dir) => {
      val sigs = Dedup.minhashSignatures(tbl(s, dir, "documents"), "doc_id", "text", n = 3, h = 4)
      Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
    }),

    // ---- dup clusters: connected components over the LSH pair graph
    //      (transitive closure -> one canonical doc per near-dup group) ----
    "q36_dup_clusters" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      Dedup.dupClusters(docs, pairs, "doc_id")
    }),

    // ---- benchmark decontamination: train docs sharing >= 5 shingles
    //      with any "benchmark" doc (doc_id % 50 == 0 plays the benchmark) ----
    "q39_contamination" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, minOverlap = 5)
    }),

    // ---- deterministic stratified sampling (data-mixing quotas): keep
    //      50% of en, 10% of und, 20% of other languages, keyed on an
    //      md5 id hash — reproducible at any partitioning ----
    "q40_stratified_sample" -> ((s, dir) => {
      val stats = graft.operators.TextStats.textStats(tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("pred_lang"))
      val rate = when(col("pred_lang") === "en", lit(50))
        .when(col("pred_lang") === "und", lit(10))
        .otherwise(lit(20))
      graft.operators.Sampling.hashSample(stats, "doc_id", rate)
    }),

    // ---- the full training-data pipeline, one declarative plan:
    //      quality filter → exact-dedup keep → benchmark decontamination →
    //      stratified mixing quotas → corpus mixture stats. Every stage is
    //      individually oracle-checked (q15/q10/q39/q40); this composes
    //      them end-to-end and hash-matches the whole pipeline. ----
    "q41_full_pipeline" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 50 =!= 0)
      val bench = docs.filter(col("doc_id") % 50 === 0)
      val kept = graft.operators.TextStats.textStats(train, "doc_id", "text")
        .filter(col("quality") >= 0.55)
      val canon = kept
        .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(min(struct(col("doc_id"), col("pred_lang"))).as("c"))
        .select(col("c.doc_id").as("doc_id"), col("c.pred_lang").as("pred_lang"))
      val contaminated = Dedup.contamination(train, bench, "doc_id", "text", n = 3, minOverlap = 5)
        .select("doc_id")
      val clean = canon.join(contaminated, Seq("doc_id"), "left_anti")
      val rate = when(col("pred_lang") === "en", lit(50))
        .when(col("pred_lang") === "und", lit(10))
        .otherwise(lit(20))
      graft.operators.Sampling.hashSample(clean, "doc_id", rate)
        .groupBy("pred_lang").agg(count(lit(1)).as("n_docs"))
    }),

    // ---- repetition filter stats: duplicate-n-gram ratios per doc (the
    //      boilerplate/spam signal of corpus-cleaning recipes) ----
    "q42_repetition" -> ((s, dir) =>
      graft.operators.TextStats.repetitionStats(tbl(s, dir, "documents"), "doc_id", "text", n = 3)),

    // ---- boilerplate discovery: corpus-wide top-k n-grams by document
    //      frequency (sort-limit top-k, never a full-vocabulary window) ----
    "q43_top_ngrams" -> ((s, dir) =>
      graft.operators.TextStats.topNgrams(tbl(s, dir, "documents"), "doc_id", "text", n = 3, k = 20)),

    // ---- training-sequence packing: token-budget bin assignment via a
    //      hierarchical (blocked) prefix sum — no global-order window ----
    "q44_pack_sequences" -> ((s, dir) =>
      graft.operators.Packing.sequenceStats(tbl(s, dir, "documents"), "doc_id", "text",
        targetTokens = 2048, blockSize = 64)),

    // ---- Zipf head: top-R vocabulary with cumulative token share ----
    "q45_vocab_coverage" -> ((s, dir) =>
      graft.operators.TextStats.vocabCoverage(tbl(s, dir, "documents"), "text", topR = 50)),

    // ---- PII scrubbing: regexp count + redact, exercised on contact
    //      strings derived deterministically from the corpus (the raw
    //      synthetic docs contain no PII-shaped spans; deriving them in
    //      the query keeps the regex parity oracle-checked end-to-end) ----
    "q46_pii_redact" -> ((s, dir) => {
      val w = split(col("text"), " ")
      val synth = concat(col("text"),
        lit(" contact: "), element_at(w, 1), lit("@"), element_at(w, 2),
        lit(".com tel: 555-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
        lit(" ip: 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"), lit(".1"))
      graft.operators.Pii.piiStats(
        tbl(s, dir, "documents").select(col("doc_id"), synth.as("text")), "doc_id", "text")
    }),

    // ---- Gopher-style quality rule flags: per-rule booleans + conjunction,
    //      one token explode + one partial-agg groupBy ----
    "q47_gopher_rules" -> ((s, dir) =>
      graft.operators.TextStats.gopherRules(tbl(s, dir, "documents"), "doc_id", "text")),

    // ---- quality-rule attribution: per rule, total failures and
    //      EXCLUSIVE failures (docs only that rule rejects — what
    //      relaxing it would rescue); the threshold-tuning table ----
    "q112_rule_attribution" -> ((s, dir) =>
      graft.operators.TextStats.ruleAttribution(tbl(s, dir, "documents"), "doc_id", "text")),

    // ---- incremental crawl dedup: a new batch (docs with id%10<2, plus
    //      "re-crawled" verbatim copies of corpus docs under new ids) is
    //      statused against the existing corpus — exact fingerprint probe +
    //      capped cross-corpus n-gram Jaccard; the corpus is never
    //      self-compared ----
    "q48_incremental_dedup" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 >= 2).select("doc_id", "text")
      val recrawled = corpus.filter(col("doc_id") % 50 === 7)
        .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text"))
      val newBatch = docs.filter(col("doc_id") % 10 < 2).select("doc_id", "text")
        .unionAll(recrawled)
      Dedup.incrementalDedup(newBatch, corpus, "doc_id", "text",
        n = 3, minJaccard = 0.2, maxDf = 5)
    }),

    // ---- span-level exact substring dedup (ExactSubstr discipline):
    //      maximal runs of >= 2 consecutive duplicated 8-token shingles,
    //      reported as 1-based inclusive token ranges ----
    "q71_dup_spans" -> ((s, dir) =>
      Dedup.dupSpans(tbl(s, dir, "documents"), "doc_id", "text",
        k = 8, minRun = 2)),

    // ---- per-doc duplicated-token accounting: union of all duplicated
    //      8-shingle spans, overlap counted once; 0 for clean docs ----
    "q72_span_coverage" -> ((s, dir) =>
      Dedup.spanCoverage(tbl(s, dir, "documents"), "doc_id", "text", k = 8)),

    // ---- ingest-time span scrub: same corpus/new split as q48; tokens
    //      of new docs covered by a corpus-known 8-shingle are removed,
    //      text rebuilt in token order (keep-first: the corpus copy is
    //      the one retained) ----
    "q73_span_scrub" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 >= 2).select("doc_id", "text")
      val newBatch = docs.filter(col("doc_id") % 10 < 2).select("doc_id", "text")
      Dedup.scrubSpans(newBatch, corpus, "doc_id", "text", k = 8)
    }),

    // ---- bloom-pruned incremental exact dedup: same ingest split as q48,
    //      but the corpus is represented by a reusable relational bloom word
    //      table and only bloom candidates reach the confirming fp semi-join.
    //      The bloom changes cost, not the answer → plain-semi-join oracle ----
    "q53_bloom_dedup" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 >= 2).select("doc_id", "text")
      val recrawled = corpus.filter(col("doc_id") % 50 === 7)
        .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text"))
      val newBatch = docs.filter(col("doc_id") % 10 < 2).select("doc_id", "text")
        .unionAll(recrawled)
      Dedup.bloomPrunedDedup(newBatch, corpus, "doc_id", "text", mBits = 1L << 20, k = 5)
    }),

    // ---- per-language adaptive quality gate: keep the top half of EACH
    //      language's quality distribution (exact percent_rank semantics,
    //      computed over the distinct-score distribution — no per-group
    //      full sort). NaN/null scores excluded up front (n_tokens >= 1) ----
    "q54_adaptive_quality" -> ((s, dir) => {
      val stats = graft.operators.TextStats.textStats(tbl(s, dir, "documents"), "doc_id", "text")
        .filter(col("n_tokens") >= 1)
        .select(col("doc_id"), col("lang"), col("quality"))
      graft.operators.TextStats.adaptiveThreshold(stats, "doc_id", "lang", "quality", minPct = 0.5)
    }),

    // ---- canonical doc per near-dup cluster: q36's components + q15's
    //      quality -> keep the best-quality member (ties: lowest id) ----
    "q55_canonical_docs" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      // sigs materialized ONCE (VERDICT r08): downstream consumers —
      // the LSH banding here, the cluster seed, the quality join — must
      // not re-derive the corpus-wide signature aggregation; at 100 TB a
      // re-derivation is a full corpus re-read
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        .transform(graft.operators.Checkpoints.tracked(_))
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      // canonicalDocs consumes its clusters⋈scores join three times (best
      // score, canonical id, member flags) — materialize both inputs so
      // the label tail and the quality scan run once, not three times
      val clusters = Dedup.dupClusters(docs, pairs, "doc_id").transform(graft.operators.Checkpoints.tracked(_))
      val scores = graft.operators.TextStats.textStats(docs, "doc_id", "text")
        .filter(col("n_tokens") >= 1)
        .select(col("doc_id"), col("quality"))
        .transform(graft.operators.Checkpoints.tracked(_))
      Dedup.canonicalDocs(clusters, scores, "doc_id", "quality")
    }),

    // ---- leakage-safe train/valid split: the split hashes the dup-CLUSTER
    //      label, so near-duplicates never straddle the eval boundary ----
    "q56_leakage_split" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        .transform(graft.operators.Checkpoints.tracked(_)) // shingle the corpus once per plan (see q55)
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      // the dupClusters tail (label ⋈ docs remap) re-reads the corpus id
      // column per consumer — materialize before the split projection
      val clusters = Dedup.dupClusters(docs, pairs, "doc_id").transform(graft.operators.Checkpoints.tracked(_))
      graft.operators.Sampling.leakageSafeSplit(clusters, "doc_id", validPct = 10)
    }),

    // ---- bigram LM table: top-20 bigrams with conditional P(w2|w1) ----
    "q57_bigram_lm" -> ((s, dir) =>
      graft.operators.TextStats.bigramLm(tbl(s, dir, "documents"), "text", topK = 20)),

    // ---- hashed bag-of-words features: sparse (doc, bucket, tf) rows,
    //      md5-bucketed tokens — deterministic model-free "embeddings" ----
    "q58_hashed_bow" -> ((s, dir) =>
      graft.operators.Features.hashedBow(tbl(s, dir, "documents"), "doc_id", "text", dim = 64)),

    // ---- exact BoW-cosine top-k similar docs (self-match ranks first at
    //      1.0 — the reference's golden-output semantics, relationally) ----
    "q59_bow_topk" -> ((s, dir) => {
      val bow = graft.operators.Features.hashedBow(tbl(s, dir, "documents"), "doc_id", "text", dim = 64)
      graft.operators.Features.bowCosineTopK(bow, "doc_id", queryId = 42L, k = 10)
    }),

    // ---- LSH-propose -> exact-verify composite: exact Jaccard computed
    //      ONLY for LSH candidate pairs; rejections stay visible ----
    "q60_lsh_verified" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      Dedup.jaccardForPairs(pairs, docs, "doc_id", "text", n = 3, minJaccard = 0.4)
    }),

    // ---- tokenizer fertility by language: BPE pieces per whitespace
    //      word per predicted language — the multilingual-tokenizer
    //      fairness table (a language whose fertility is 2x pays 2x the
    //      context budget per word); integer sums, one exact division ----
    "q114_tokenizer_fertility" -> ((s, dir) =>
      graft.operators.TextStats.textStats(tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("pred_lang"),
          col("n_tokens").cast("long").as("n_words"),
          TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("words"), sum("n_bpe").as("bpe"))
        .withColumn("fertility",
          col("bpe").cast("double") / col("words").cast("double"))),

    // ---- corpus snapshot diff: crawl N vs crawl N+1 churn — snapshot B
    //      is derived deterministically (docs id%17==0 removed, id%13==0
    //      re-crawled with a changed prefix, fresh ids minted NEGATIVE —
    //      -(id+1) — for id%19==0, so they can never collide with real
    //      non-negative doc ids at ANY scale factor) ----
    "q113_snapshot_diff" -> ((s, dir) => {
      val a = tbl(s, dir, "documents")
      val b = a.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(lit("recrawl "), col("text")))
            .otherwise(col("text")).as("text"))
        .unionAll(a.filter(col("doc_id") % 19 === 0)
          .select((lit(0L) - col("doc_id") - 1).as("doc_id"), col("text")))
      Dedup.snapshotDiff(a, b, "doc_id", "text")
    }),

    // ---- deterministic in-batch negatives: contrastive-training pairs —
    //      hash-batched, different-label, ranked by the md5 pair hash
    //      through the bounded heap (pairs O(n·batch), never n²) ----
    "q111_inbatch_negatives" -> ((s, dir) =>
      graft.operators.Sampling.inBatchNegatives(
        tbl(s, dir, "embeddings").select(col("vec_id"), col("label")),
        "vec_id", "label", numBatches = 256, k = 3)),

    // ---- HTML boilerplate strip: the extraction step between a crawl
    //      fetch and every text operator — script/style blocks drop
    //      whole, tags drop, entities decode, whitespace collapses;
    //      the HTML is synthesized around the documents text so the
    //      oracle wraps and strips the same bytes ----
    "q110_html_strip" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>t&amp;x</title><script type=\"x\">var a = '<p>junk</p>';</script></head><body><p>"),
        col("text"),
        lit("</p><div class=\"foot\">&lt;footer&gt;&nbsp;text</div></body></html>"))
      tbl(s, dir, "documents").select(col("doc_id"),
        TextFunctions.stripHtml(html).as("clean_text"))
        .withColumn("n_tok", TextFunctions.tokenCount(col("clean_text")).cast("long"))
    }),

    // ---- WARC ingestion (the Common Crawl distribution format): REAL
    //      Content-Length-honoring record parser over closed-form
    //      streams — record 0's payload embeds the literal "WARC/1.0"
    //      to pin the no-delimiter-splitting contract; the oracle
    //      re-derives every field from the arithmetic alone ----
    "q108_warc_records" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id"))
      graft.sources.Warc.records(graft.sources.Warc.syntheticWarc(ids))
        .select(col("id"), col("rec"), col("host"), col("content_length"),
          TextFunctions.tokenCount(col("payload")).cast("long").as("n_tok"))
    }),

    // ---- per-host crawl audit: pages, payload bytes and token totals
    //      per host — the fetch-budget/politeness review table ----
    "q115_host_stats" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id"))
      graft.sources.Warc.records(graft.sources.Warc.syntheticWarc(ids))
        .groupBy("host")
        .agg(count(lit(1)).as("n_pages"),
          sum(col("content_length")).as("payload_bytes"),
          sum(TextFunctions.tokenCount(col("payload")).cast("long")).as("tokens"))
    }),

    // ---- URL-level first-wins dedup — the FIRST dedup any crawl runs:
    //      canonical fetch per URL = min (stream id, record idx), packed
    //      as id·8+rec (rec < 8) so the argmin is one integer min ----
    "q109_url_dedup" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id"))
      val recs = graft.sources.Warc.records(graft.sources.Warc.syntheticWarc(ids))
        .select(col("id"), col("rec"), col("url"),
          (col("id") * 8 + col("rec")).as("pk"))
      val canon = recs.groupBy("url").agg(min(col("pk")).as("pk_min"))
      recs.join(canon, "url")
        .select(col("id"), col("rec"), col("url"),
          (col("pk") =!= col("pk_min")).cast("int").as("is_dup"))
    }),

    // ---- the STREAMING ingest ladder's batch kernel as one oracle row:
    //      Pipeline.prepareVerdicts over q48's planted ingest split —
    //      gate (Gopher ∧ quality) → incremental exact/near dedup vs the
    //      corpus → per-doc status + (n_tok, bin) budget columns. The
    //      StreamingSpec pins streamed ≡ this batch bit-for-bit, so the
    //      streaming path is transitively oracle-checked ----
    "q119_prepare_verdicts" -> ((s, dir) => q119Verdicts(s, dir)),

    // ---- the streaming quota dashboard's batch kernel: the token-budget
    //      decision over the ACCUMULATED q119 verdicts —
    //      Pipeline.budgetFromVerdicts fills per-source quality bins
    //      best-first until the quota, from the (n_tok, bin) columns alone
    //      (no text re-read). Pure function of the verdict SET, so the
    //      streamed quota table (StreamingSpec) is transitively
    //      oracle-checked through this row ----
    "q120_budget_from_verdicts" -> ((s, dir) =>
      graft.operators.Pipeline.budgetFromVerdicts(
        q119Verdicts(s, dir), "doc_id", "source", quota = Q120Quota)),

    // ---- mixture EXECUTION by epoch upsampling: every source fills a
    //      2,600-token target — whole epochs by exact integer DIV capped
    //      at 2 (the repetition guard), the remainder as a hash-bin
    //      prefix (tokenBudgetSelect's bounded-window discipline keyed
    //      on the id hash). At this SF six sources cap at 2 whole epochs
    //      (rem 0) and the rest get 1 whole + a fractional epoch — both
    //      regimes land in the hash ----
    "q123_epoch_upsample" -> ((s, dir) =>
      graft.operators.Sampling.epochUpsample(tbl(s, dir, "documents"),
        "doc_id", "source", "text", targetTokens = 2600L, maxEpochs = 2)),

    // ---- embedding-space outlier scrub: exact fixed-point distance to
    //      the integer corpus centroid (per-dim sums partial-agg to dim
    //      keys, centroid one broadcast row, distance a map-side HOF) —
    //      threshold at the empirical ~97th percentile so the flag
    //      exercises both verdicts at this SF ----
    "q124_embedding_outliers" -> ((s, dir) =>
      graft.operators.Features.embeddingOutliers(
        tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", threshold = 1020000000000L)),

    // ---- diversity-capped sampling: ≤3 vectors per sign-LSH cell drawn
    //      in id-hash order (bounded heap, never a per-bucket sort) —
    //      dense embedding-space blobs trim, sparse regions survive
    //      whole (34 buckets trim at this SF; 146 pass untouched) ----
    "q125_diversity_sample" -> ((s, dir) =>
      graft.operators.Sampling.diversitySample(
        tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dim = EmbDim, capPerBucket = 3)),

    // ---- corpus drift monitor: top total-variation contributors
    //      between two snapshot halves, exact cross-multiplied integers
    //      (|c_a·N_b − c_b·N_a| — no division, no float accumulation) ----
    "q126_vocab_drift" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.operators.TextStats.vocabDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text", topN = 20)
    }),

    // ---- host-boilerplate line removal (the CCNet/RefinedWeb template
    //      scrub): a per-source footer planted on EVERY doc (df = 100%
    //      ≥ 50% → removed) plus a promo line on every 5th doc (df = 20%
    //      < 50% → survives, exercising the keep verdict); surviving
    //      lines keep their bytes and order, so text_clean re-derives
    //      the original text on footer-only docs ----
    "q127_boilerplate_scrub" -> ((s, dir) =>
      graft.operators.Dedup.scrubBoilerplate(
        tbl(s, dir, "documents").select(col("doc_id"), col("source"),
          concat(col("text"), lit("\nsubscribe to "), col("source"),
            lit(" newsletter"),
            when(col("doc_id") % 5 === 0,
              concat(lit("\npromo "), col("source"))).otherwise(lit("")))
            .as("text")),
        "doc_id", "source", "text", minDocs = 2, minFrac = 0.5)),

    // ---- URL canonicalization (the normalize step BEFORE the crawl's
    //      first-wins URL dedup): planted URLs mix case, default vs real
    //      ports, tracking params in shuffled positions, trailing
    //      slashes, and fragments — every rule branch lands at this SF.
    //      Path case survives (case-significant), host case does not ----
    "q128_url_canonical" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
          lit("Example"), (col("doc_id") % 7).cast("string"), lit(".COM"),
          when(col("doc_id") % 11 === 0, lit(":8080"))
            .when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
          lit("/Page"), (col("doc_id") % 13).cast("string"),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 4 === 0, lit("?utm_source=x&b=2&a=1"))
            .when(col("doc_id") % 4 === 1, lit("?fbclid=z"))
            .when(col("doc_id") % 4 === 3, lit("?z=1&gclid=g&a=2"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#sec")).otherwise(lit(""))).as("url"))
        .select(col("doc_id"), col("url"),
          graft.functions.TextFunctions.canonicalizeUrl(col("url")).as("url_canon"))),

    // ---- DSIR importance weights (Xie et al. 2023): log(p_target/p_raw)
    //      per document under hashed-bigram unigram models — the English
    //      half as the target distribution, the whole corpus as raw.
    //      Bucket weights fixed-pointed once per distinct bucket
    //      (micro-nats), doc scores are order-independent integer sums ----
    "q129_dsir_weights" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.operators.Sampling.dsirWeights(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text",
        n = 2, buckets = 65536)
    }),

    // ---- DSIR resampling (deterministic variant): count-quota selection
    //      of the highest-importance docs WITHOUT a global sort — integer
    //      score bins, whole bins share a fate, overshoot ≤ one bin ----
    "q130_dsir_select" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.operators.Sampling.quotaSelectByScore(
        graft.operators.Sampling.dsirWeights(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text",
          n = 2, buckets = 65536),
        "doc_id", "dsir_fp", quota = 100L, bins = 50)
    }),

    // ---- host-level link graph (the web-graph quality prior): planted
    //      anchors exercise lowercase/port/relative handling — uppercase
    //      HTTPS host with a port normalizes, the relative link drops,
    //      and h*.example targets appear as never-crawled frontier rows ----
    "q137_link_graph" -> ((s, dir) => {
      val crawl = tbl(s, dir, "documents").select(col("doc_id"),
        col("source").as("host"),
        concat(
          lit("<html><body><a href=\"http://h"), (col("doc_id") % 7).cast("string"),
          lit(".example/p"), col("doc_id").cast("string"), lit("\">x</a>"),
          when(col("doc_id") % 4 === 0,
            concat(lit("<a href=\"HTTPS://H"), (col("doc_id") % 5).cast("string"),
              lit(".EXAMPLE:8080/y\">u</a>"))).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, lit("<a href=\"/local\">rel</a>"))
            .otherwise(lit("")),
          col("text"), lit("</body></html>")).as("html"))
      graft.operators.Pipeline.hostLinkGraph(crawl, "host", "html")
    }),

    // ---- homoglyph-fold dedup (the spoofing alphabet): odd ids spell
    //      the even twin's text with Cyrillic lookalikes (U+0430 а,
    //      U+0435 е, U+0455 ѕ) — byte-distinct, blocklist-evading, and
    //      invisible to every UAX #15 form; through confusableFold ∘
    //      exactDedup the spoof collapses onto the ASCII original ----
    "q147_confusable_dedup" -> ((s, dir) => {
      val planted = tbl(s, dir, "documents").select(col("doc_id"),
        concat(lit("offer "), expr("doc_id DIV 2").cast("string"),
          when(col("doc_id") % 2 === 0, lit(" paypal secure"))
            .otherwise(lit(" pаypаl ѕеcurе"))).as("text"))
      graft.operators.Dedup.exactDedup(
        planted.select(col("doc_id"),
          graft.functions.TextFunctions.confusableFold(col("text")).as("text")),
        "doc_id", "text")
    }),

    // ---- the NFC → fingerprint dedup composition (WHY normalization
    //      sits before every dedup key): planted pairs spell the same
    //      accented text decomposed (e+U+0301) on even ids, precomposed
    //      (U+00E9) on odd — byte-distinct, so WITHOUT normalization no
    //      pair merges; through nfcNormalize ∘ exactDedup every odd id
    //      deduplicates onto its even twin ----
    "q146_nfc_dedup" -> ((s, dir) => {
      val planted = tbl(s, dir, "documents").select(col("doc_id"),
        concat(lit("group "), expr("doc_id DIV 2").cast("string"),
          when(col("doc_id") % 2 === 0, lit(" caf\u00E9"))
            .otherwise(lit(" cafe\u0301"))).as("text"))
      graft.operators.Dedup.exactDedup(
        planted.select(col("doc_id"),
          graft.functions.TextFunctions.nfcNormalize(col("text")).as("text")),
        "doc_id", "text")
    }),

    // ---- posting-list byte encoding (q131's missing half): per term the
    //      LEB128 varint spelling of its gap stream, as hex — the oracle
    //      re-derives the EXACT BYTES with integer shifts; same df band,
    //      so the per-term reassembly buffer stays maxDf-bounded ----
    "q144_posting_bytes" -> ((s, dir) =>
      graft.operators.Retrieval.postingBytes(
        tbl(s, dir, "documents"), "doc_id", "text", minDf = 50L, maxDf = 400L)),

    // ---- Unicode NFC normalization (the cleaning step between mojibake
    //      repair and tokenization): planted decomposed sequences
    //      (e+U+0301, i+U+0308, A+U+030A) and the canonical singleton
    //      U+212B ANGSTROM SIGN all collapse to their precomposed forms —
    //      both engines implement UAX #15, so the normalized TEXT
    //      hash-matches, and the codepoint lengths pin that composition
    //      actually happened ----
    "q143_nfc_normalize" -> ((s, dir) => {
      val planted = concat(col("text"),
        // explicit escapes: the source must carry the DECOMPOSED
        // sequences (an editor could silently precompose literal chars)
        lit(" Cafe\u0301 nai\u0308ve \u212B A\u030A"))
      tbl(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextFunctions.nfcNormalize(planted).as("text_nfc"),
        length(planted).cast("long").as("len_raw"),
        length(graft.functions.TextFunctions.nfcNormalize(planted))
          .cast("long").as("len_nfc"))
    }),

    // ---- blocklist-hit context snippets (the review-queue extractor):
    //      ±3-token windows around each watched-term occurrence; edge
    //      hits clamp at the document boundaries ----
    "q142_blocklist_context" -> ((s, dir) =>
      graft.operators.TextStats.blocklistContexts(
        tbl(s, dir, "documents"), "doc_id", "text",
        terms = Seq("slow", "merge"), window = 3)),

    // ---- KMV-sketch source containment (the GB-KMV pattern): pairwise
    //      directional containment from k-minimum-value sketches — the
    //      estimate itself is integer counts + one division, replayed
    //      exactly by the oracle ----
    "q141_kmv_containment" -> ((s, dir) =>
      graft.operators.TextStats.kmvContainmentPairs(
        tbl(s, dir, "documents"), "source", "text", n = 3, k = 64)),

    // ---- packing boundary table (the data-loader contract): per doc its
    //      sequence, within-sequence offset, and the overrun flag marking
    //      the ≤1 doc per sequence whose tail crosses the budget ----
    "q140_pack_boundaries" -> ((s, dir) =>
      graft.operators.Packing.packBoundaries(
        tbl(s, dir, "documents"), "doc_id", "text", targetTokens = 2048)),

    // ---- anchor-text term table (how the web DESCRIBES each target):
    //      planted anchors carry doc-derived terms; markup-bearing and
    //      relative anchors drop by the documented [^<] / absolute-http
    //      bounds ----
    "q139_anchor_texts" -> ((s, dir) => {
      val crawl = tbl(s, dir, "documents").select(col("doc_id"),
        concat(
          lit("<html><body><a href=\"http://h"), (col("doc_id") % 7).cast("string"),
          lit(".example/p\">guide t"), (col("doc_id") % 11).cast("string"),
          lit("</a>"),
          when(col("doc_id") % 4 === 0,
            concat(lit("<a href=\"HTTPS://H"), (col("doc_id") % 5).cast("string"),
              lit(".EXAMPLE:8080/y\">ref <b>bold</b></a>"))).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, lit("<a href=\"/rel\">local</a>"))
            .otherwise(lit("")),
          col("text"), lit("</body></html>")).as("html"))
      graft.operators.Pipeline.anchorTexts(crawl, "html")
    }),

    // ---- PageRank-lite centrality over the same planted host graph:
    //      two fixed-point iterations, integer mass flow (rank·n DIV
    //      out_w), damping as one integer multiply-divide — the oracle
    //      unrolls the identical two rounds ----
    "q138_host_rank" -> ((s, dir) => {
      val crawl = tbl(s, dir, "documents").select(col("doc_id"),
        col("source").as("host"),
        concat(
          lit("<html><body><a href=\"http://h"), (col("doc_id") % 7).cast("string"),
          lit(".example/p"), col("doc_id").cast("string"), lit("\">x</a>"),
          when(col("doc_id") % 4 === 0,
            concat(lit("<a href=\"HTTPS://H"), (col("doc_id") % 5).cast("string"),
              lit(".EXAMPLE:8080/y\">u</a>"))).otherwise(lit("")),
          col("text"), lit("</body></html>")).as("html"))
      graft.operators.Pipeline.hostRank(crawl, "host", "html", iterations = 2)
    }),

    // ---- per-source token-length quantiles by exact histogram
    //      inversion: p50/p90/p99 as true order statistics (integer
    //      cross-multiply, no division), the doc stream never sorted ----
    "q136_length_quantiles" -> ((s, dir) =>
      graft.operators.TextStats.lengthQuantiles(
        tbl(s, dir, "documents"), "source", "text", maxLen = 4096)),

    // ---- mojibake detection (the ftfy tier of crawl cleaning): planted
    //      ISO-8859-1 mojibake (Ã© pairs), cp1252 mojibake (â€ trigrams,
    //      Â© symbols), and a CLEAN doc carrying a real "café" that must
    //      NOT fire — literal-alternation regex, identical in both
    //      engines; the guarded repair is PropertySpec territory ----
    "q135_mojibake" -> ((s, dir) => {
      val planted = tbl(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" cafÃ© touchÃ©"))
            .when(col("doc_id") % 3 === 1, lit(" donâ€™t â€” Â© 2024"))
            .otherwise(lit(" clean café"))).as("text"))
      planted.select(col("doc_id"),
        graft.functions.TextFunctions.mojibakeHits(col("text")).cast("long").as("n_moji"),
        graft.functions.TextFunctions.fixMojibake(col("text")).as("text_fixed"))
        .withColumn("is_moji", (col("n_moji") > 0).cast("int"))
        .withColumn("n_after",
          graft.functions.TextFunctions.mojibakeHits(col("text_fixed")).cast("long"))
    }),

    // ---- Count-Min sketch audit: depth-4 × width-64 sketch of the token
    //      stream next to exact counts — the bounded-memory frequency
    //      answer; width 64 forces visible collisions at this SF, so the
    //      est ≥ true overestimate guarantee does real work ----
    "q133_cms_sketch" -> ((s, dir) =>
      graft.operators.TextStats.cmsEstimates(
        tbl(s, dir, "documents"), "text", depth = 4, width = 64)),

    // ---- dyadic-temperature mixture: T = 3/4 via the IEEE-exact sqrt
    //      chain x^(3/4) = √x · √√x — any dyadic T stays oracle-exact
    //      where a pow()-based form could not be ----
    "q134_tempered_mixture" -> ((s, dir) =>
      graft.operators.TextStats.mixtureWeightsTempered(
        tbl(s, dir, "documents"), "source", "text", num = 3, log2den = 2)),

    // ---- classifier calibration: the precision/recall operating-point
    //      table over the NB-scored held-out half — per score bin, the
    //      confusion counts of "keep this bin or higher"; counts integer,
    //      prec/rec one exact division each, window over ≤ bins rows ----
    "q132_pr_sweep" -> ((s, dir) => {
      val train = nbTrain(s, dir)
      val held = tbl(s, dir, "documents").filter(col("doc_id") % 2 === 1)
      val scored = graft.operators.Classify.nbScore(
        held,
        graft.operators.Classify.nbModel(train, "cls", "text"),
        graft.operators.Classify.nbPriors(train, "cls"),
        "doc_id", "text")
        .join(held.select(col("doc_id"),
          col("source").isin(NbCurated: _*).cast("int").as("label")), "doc_id")
      graft.operators.Classify.thresholdSweep(scored, "llr_fp", "label", bins = 20)
    }),

    // ---- delta-encoded posting lists: the inverted-index layout sink —
    //      df band [50, 400] drops one too-rare and one stopword-class
    //      term at this SF (both bounds exercised), every surviving
    //      window partition is maxDf-bounded, first gap from a −1
    //      list-start sentinel ----
    "q131_posting_lists" -> ((s, dir) =>
      graft.operators.Retrieval.postingLists(
        tbl(s, dir, "documents"), "doc_id", "text", minDf = 50L, maxDf = 400L)),

    // ---- the cleaning tier in its SQL SPELLING: strip_html →
    //      token_count / lang_id / quality_score through the
    //      GraftExtensions function registry (registerInto — the same
    //      builders spark.sql.extensions injects), over a synthesized
    //      HTML wrapper so the strip does real work (tags, a script
    //      block, an author-escaped entity). Pure-SQL users reach the
    //      pipeline layer; this row hash-pins that spelling ----
    "q121_sql_cleaning" -> ((s, dir) => {
      GraftExtensions.registerInto(s)
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("<html><body><p class=\"x\">"), col("text"),
            lit("</p><script>var n=1;</script> &amp;fin</body></html>")).as("html"))
        .createOrReplaceTempView("g_crawl")
      s.sql("""SELECT doc_id, strip_html(html) AS text,
              |  CAST(token_count(strip_html(html)) AS BIGINT) AS n_tok,
              |  lang_id(strip_html(html)) AS lang,
              |  quality_score(strip_html(html)) AS q
              |FROM g_crawl""".stripMargin)
    }),

    // ---- the crawl FRONT DOOR as one oracle row: real WARC bytes (half
    //      the synthetic files gzipped) → inflate → Content-Length record
    //      parse → HTML strip → URL first-wins dedup — docsFromWarc's
    //      canonical-fetch table hash-matched against pure SQL arithmetic
    //      (the fixture's closed form; no byte is touched in the oracle).
    //      doc_id (xxhash64) is projected out — not SQL-derivable ----
    "q118_crawl_docs" -> ((s, dir) => {
      val nFiles = tbl(s, dir, "documents").filter(col("doc_id") % 7 === 0).count()
      val files = graft.sources.Warc.inflateFiles(
        graft.sources.Warc.syntheticCrawlFileRows(s, nFiles, perFile = 13))
      graft.operators.Pipeline.docsFromWarc(graft.sources.Warc.recordsFromFiles(files))
        .select(col("url"), col("source"), col("text"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    }),

    // ---- winnowing fingerprints: the MOSS document sketch — window-min
    //      shingle hashes (rightmost tie), guarantee: shared runs of
    //      w+k-1 tokens share a fingerprint, density ~2/(w+1) ----
    "q106_winnowing" -> ((s, dir) =>
      Dedup.winnowFingerprints(tbl(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4)),

    // ---- winnow-sketch candidate pairs: the MOSS discovery join — the
    //      self-join runs on the ~2L/(w+1)-row sketches, never the
    //      shingle sets; ubiquitous prints droppable via maxDf ----
    "q107_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowCandidatePairs(tbl(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4, minShared = 2)),

    // ---- containment verification: |A∩B| / min(|A|,|B|) on the SAME LSH
    //      candidates as q60 — the subset-duplication metric (a wire story
    //      embedded in a longer page scores ~1.0 here, ~0.1 Jaccard) ----
    "q105_containment" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        .transform(graft.operators.Checkpoints.tracked(_)) // shingle the corpus once per plan (see q55)
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      Dedup.containmentForPairs(pairs, docs, "doc_id", "text", n = 3, minContainment = 0.9)
    }),

    // ---- batch BoW-cosine top-k: bounded-heap per-query aggregate over
    //      the sparse feature join (cosine DISTANCE, the vector convention) ----
    "q62_bow_topk_batch" -> ((s, dir) => {
      val bow = graft.operators.Features.hashedBow(tbl(s, dir, "documents"), "doc_id", "text", dim = 64)
      graft.operators.Features.bowCosineTopKBatch(bow, "doc_id", queryIds = Seq(7L, 42L), k = 10)
    }),

    // ---- Z-order (Morton) values: the multi-column data-skipping layout
    //      key — exact bit interleave, oracle-checkable ----
    "q63_zorder" -> ((s, dir) =>
      tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        graft.sources.Bucketing.zValue(col("l_partkey"), col("l_suppkey")).as("zval"))),

    // ---- MinHash Jaccard estimate on LSH candidates: the triage tier
    //      between propose (q12) and exact verify (q60) — signatures
    //      only, shingle sets never touched ----
    "q65_minhash_estimate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      // sigs feeds BOTH the LSH banding and the estimate's two join legs:
      // unmaterialized, the signature aggregation would run three times
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        .transform(graft.operators.Checkpoints.tracked(_))
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      Dedup.minhashEstimate(pairs, sigs, "doc_id", h = 4)
    }),

    // ---- the full near-dup triage ladder as ONE declarative plan:
    //      LSH propose -> signature-only estimate filter -> exact verify
    //      runs ONLY on pairs whose estimate clears the bar ----
    // ---- targeted data selection: hashed n-gram domain-affinity score
    //      (DSIR-style importance, log-free so it stays oracle-exact) —
    //      fraction of a doc's distinct shingle buckets occurring in the
    //      target domain (here: the English slice) ----
    "q68_domain_score" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.operators.Sampling.domainScore(
        docs, docs.filter(col("lang") === "en"), "doc_id", "text", n = 2, buckets = 65536)
    }),

    // ---- sources: CIFAR-binary record decode (the reference's second
    //      pipeline's distribution format). Synthetic 3073-byte records
    //      with closed-form bytes — label (id+r) % 10, pixel j
    //      (id*31 + r*17 + 3j²) % 256 — half the files gzipped; the Spark
    //      side decodes through the production Cifar record iterator
    //      (inflate included) and computes raw-byte sums + a
    //      position-weighted checksum, the oracle re-derives both from
    //      the formula without touching a byte (q67's trick on the
    //      binary source) ----
    "q70_cifar_decode" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("id"))
      graft.sources.Cifar.decodeStats(graft.sources.Cifar.syntheticBatches(ids))
    }),

    // ---- multimodal: REAL video decode (YUV4MPEG2 — the public
    //      uncompressed interchange format, plain-text header + raw
    //      planes, parseable in a bare JVM). Closed-form luma
    //      (id*31 + f*29 + x*7 + y*13) % 256; odd ids carry C420 chroma
    //      (the skip path), even ids Cmono; the frame-weighted sum
    //      catches frame permutations. The oracle re-derives both sums
    //      from the formula without touching video bytes ----
    "q75_video_decode" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 13 === 0)
        .select(col("doc_id").as("id"))
      graft.multimodal.MediaOps.videoStats(graft.multimodal.MediaOps.syntheticY4ms(ids))
    }),

    // ---- multimodal: REAL audio decode (javax.sound.sampled). Synthetic
    //      16-bit PCM WAVs with closed-form samples (id*37 + i*101) % 4001
    //      - 2000; the Spark side encodes real WAV bytes and sums the
    //      DECODED samples, the oracle computes the same integer sums from
    //      the formula without touching audio — PCM WAV is lossless, so
    //      equality proves the JDK codec path end-to-end (q67's trick) ----
    "q69_audio_decode" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id"))
      graft.multimodal.MediaOps.audioStats(graft.multimodal.MediaOps.syntheticWavs(ids))
    }),

    // ---- multimodal: REAL image decode (javax.imageio). Synthetic PNGs
    //      with a closed-form gray(x,y) = (id*31 + x*7 + y*13) % 256; the
    //      Spark side encodes real PNG bytes and sums the DECODED pixels,
    //      the oracle computes the same integer sums from the formula
    //      without ever touching an image — PNG is lossless, so equality
    //      proves the codec path end-to-end ----
    "q67_image_decode" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"))
      graft.multimodal.MediaOps.imageStats(graft.multimodal.MediaOps.syntheticPngs(ids))
    }),

    // ---- multimodal: REAL compressed-video decode (MJPEG-in-AVI,
    //      javax.imageio per frame). Synthetic frames are 8×8-BLOCK-
    //      constant grayscale at quality 1.0 — the lossless corner of the
    //      lossy codec (DC-only blocks, all-ones quant table), so the
    //      oracle re-derives the decoded sums from the closed form
    //      block(f,bx,by) = (id·31 + f·29 + bx·7 + by·13) % 256 without
    //      touching a byte (q67's trick made safe for JPEG) ----
    "q117_mjpeg_decode" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 9 === 0)
        .select(col("doc_id").as("id"))
      graft.multimodal.MediaOps.mjpegStats(graft.multimodal.MediaOps.syntheticMjpegAvis(ids))
    }),

    "q66_triage_dedup" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      // sigs feeds the banding AND the estimate tier (see q65)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, h = 4)
        .transform(graft.operators.Checkpoints.tracked(_))
      val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b").distinct()
      val survivors = Dedup.minhashEstimate(pairs, sigs, "doc_id", h = 4)
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
      Dedup.jaccardForPairs(survivors, docs, "doc_id", "text", n = 3, minJaccard = 0.4)
    }),

    // ---- dedup detection quality: precision/recall of LSH candidate
    //      pairs against planted re-crawl ground truth (the D8 recall
    //      evaluator in dedup form) ----
    "q64_dedup_metrics" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 >= 2).select("doc_id", "text")
      val recrawled = corpus.filter(col("doc_id") % 50 === 7)
        .select((col("doc_id") + lit(10000L)).as("doc_id"), col("text"))
      val all = corpus.unionAll(recrawled)
      val truth = corpus.filter(col("doc_id") % 50 === 7)
        .select(col("doc_id").as("id_a"), (col("doc_id") + lit(10000L)).as("id_b"))
      val sigs = Dedup.minhashSignatures(all, "doc_id", "text", n = 3, h = 4)
        .transform(graft.operators.Checkpoints.tracked(_)) // shingle the corpus once per plan (see q55)
      val predicted = Dedup.lshCandidatePairs(sigs, "doc_id", h = 4, rows = 2, maxBandSize = 1000)
        .select("id_a", "id_b")
      Dedup.pairMetrics(predicted, truth)
    }),

    // ---- BPE-trainer pair statistics: corpus-weighted adjacent char-pair
    //      counts over the distinct-vocab table (the merge-step argmax) ----
    "q61_bpe_pairs" -> ((s, dir) =>
      graft.operators.TextStats.bpePairCounts(tbl(s, dir, "documents"), "text", topK = 20)),

    // ---- BPE trainer merge loop: the first 5 learned merges over the
    //      corpus-weighted word vocabulary (q61's pair stats iterated to
    //      the actual tokenizer-training artifact; argmax ties break by
    //      pair string, replacement is left-to-right non-overlapping in
    //      both engines) ----
    "q79_bpe_train" -> ((s, dir) => {
      import s.implicits._
      trainedMerges(s, dir).toDF("rank", "pair", "merged", "n_pair")
    }),

    // ---- BPE segmenter: the learned merges applied back to the corpus —
    //      per-doc symbol counts under the first 5 merges (train→apply
    //      round-trip; the compression statistic a tokenizer-budget
    //      planner reads) ----
    "q80_bpe_segment" -> ((s, dir) =>
      graft.operators.TextStats.bpeSegmentCounts(tbl(s, dir, "documents"), "doc_id", "text",
        trainedMerges(s, dir).map(t => (t._2, t._3)))),

    // ---- the full tokenizer: learned merges applied to every document,
    //      emitting the TOKEN-ID ARRAYS a data loader consumes (base ids
    //      = binary-sorted corpus alphabet, then merge ranks; -1 = unk) —
    //      the last mile q80's symbol counts stop short of ----
    // The array<long> id column is serialized to a comma-joined string
    // for the oracle row (the driver's comparator sorts/hashes scalar
    // cells only); specs exercise the array form via bpeEncodeIds.
    "q148_bpe_token_ids" -> ((s, dir) =>
      graft.operators.TextStats.bpeEncodeIds(tbl(s, dir, "documents"), "doc_id", "text",
        trainedMerges(s, dir).map(t => (t._2, t._3)))
        .select(col("doc_id"),
          array_join(col("token_ids").cast("array<string>"), ",").as("token_ids"))),

    // ---- packed training sequences carrying REAL token ids: tokenize
    //      (q148), pack by actual id-array lengths (q44's hierarchical
    //      prefix sum), concatenate in document order — the
    //      sequences-of-ids handoff to the training data loader ----
    "q149_packed_token_ids" -> ((s, dir) =>
      graft.operators.Packing.packTokenIds(tbl(s, dir, "documents"), "doc_id", "text",
        trainedMerges(s, dir).map(t => (t._2, t._3)), targetTokens = 5000)
        .select(col("seq_id"), col("n_docs"), col("seq_tokens"),
          array_join(col("token_ids").cast("array<string>"), ",").as("token_ids"))),

    // ---- BM25 lexical retrieval: fixed-point micro-nat idf per distinct
    //      term, exact-integer tf/length normalization, fixed-order
    //      per-term score chain — the term-statistics scorer that sits
    //      next to the vector search path ----
    "q81_bm25_topk" -> ((s, dir) =>
      graft.operators.Retrieval.bm25TopK(tbl(s, dir, "documents"), "doc_id", "text",
        Bm25Terms, k = 10)),

    // ---- hybrid retrieval: reciprocal-rank fusion of the BM25 ranking
    //      with the exact embedding-cosine ranking over the same id space
    //      (the standard lexical+vector combiner, score = Σ 1/(60+rank)) ----
    "q82_hybrid_rrf" -> ((s, dir) => {
      val lex = graft.operators.Retrieval.bm25RankedTopK(
        tbl(s, dir, "documents"), "doc_id", "text", Bm25Terms, k = 20)
      val e = emb(s, dir)
      val q42 = e.filter(col("id") === 42L).select(col("id").as("qid"), col("vector"))
      val vec = Knn.exactTopK(e, q42, 20, Distances.cosine)
        .select(col("id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(lex, vec, "doc_id", k0 = 60, k = 10)
    }),

    // ---- bigram-LM document scoring: per-doc total log-probability under
    //      the corpus's own bigram LM in integer micro-nats (the model-free
    //      perplexity-style quality filter; order-independent BIGINT sums) ----
    "q83_lm_score" -> ((s, dir) =>
      graft.operators.Retrieval.lmDocScores(tbl(s, dir, "documents"), "doc_id", "text")),

    // ---- CCNet-style perplexity buckets: head/middle/tail thirds of the
    //      corpus by bigram-LM fluency — percentile thresholds realized as
    //      a value-bounded centi-nat histogram, so no global sort exists ----
    "q96_perplexity_buckets" -> ((s, dir) =>
      graft.operators.Retrieval.perplexityBuckets(tbl(s, dir, "documents"), "doc_id", "text")),

    // ---- frozen-LM held-out scoring: the CCNet deployment shape — LM
    //      trained on the even half, applied to the odd half; unseen
    //      bigrams take the integer floor penalty ----
    "q100_lm_frozen" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val lm = graft.operators.Retrieval.lmTable(docs.filter(col("doc_id") % 2 === 0), "text")
      graft.operators.Retrieval.lmScoreAgainst(
        docs.filter(col("doc_id") % 2 === 1), lm, "doc_id", "text")
    }),

    // ---- Naive-Bayes quality-filter training: the GPT-3-style
    //      curated-vs-crawl classifier learned in-engine — integer token
    //      counts per (token, class) with add-one smoothing, log-probs
    //      fixed-pointed to micro-nats per distinct model row ----
    "q101_nb_model" -> ((s, dir) =>
      graft.operators.Classify.nbModel(nbTrain(s, dir), "cls", "text")),

    // ---- Naive-Bayes held-out scoring: the frozen model applied to the
    //      odd half — per-doc log-likelihood ratio as an integer sum,
    //      pred_hq = curated class wins ----
    "q102_nb_score" -> ((s, dir) => {
      val train = nbTrain(s, dir)
      graft.operators.Classify.nbScore(
        tbl(s, dir, "documents").filter(col("doc_id") % 2 === 1),
        graft.operators.Classify.nbModel(train, "cls", "text"),
        graft.operators.Classify.nbPriors(train, "cls"),
        "doc_id", "text")
    }),

    // ---- token-budget quota fill: keep best-quality docs per source
    //      until 2000 training tokens are selected — whole quality bins
    //      share a fate, so the decision is histogram-sized and the doc
    //      stream is never sorted ----
    "q104_token_budget" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetSelect(
        tbl(s, dir, "documents"), "doc_id", "source", "text", quota = 2000L)),

    // ---- the FULL --prepare composition as ONE oracle row: Gopher gate ∧
    //      quality threshold → exact-dedup canonical → benchmark
    //      decontamination → per-source token budget → curriculum key —
    //      the exact DataFrame the CLI writes, hash-matched end-to-end
    //      (q41/q47/q10/q39/q104 pin the stages; this pins the composite) ----
    "q116_prepare" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 50 =!= 0)
      val bench = docs.filter(col("doc_id") % 50 === 0).select("doc_id", "text")
      graft.operators.Pipeline.prepare(train, "doc_id", "source", "text",
        minQuality = 0.3, bench = Some(bench), quota = 2000L, numShards = 8)
    }),

    // ---- per-source TF-IDF signature terms: the datacard's "distinctive
    //      vocabulary" row — tf·idf across sources, topN per source via
    //      the bounded heap (per-source sort stays the oracle's job) ----
    "q103_source_signature" -> ((s, dir) =>
      graft.operators.TextStats.sourceSignature(
        tbl(s, dir, "documents"), "source", "text", topN = 5)),

    // ---- KMV distinct sketch: per-source vocabulary cardinality from the
    //      k smallest distinct token hashes — a dedup-on-insert bounded
    //      heap, so NO distinct shuffle exists anywhere ----
    "q99_kmv_vocab" -> ((s, dir) =>
      graft.operators.TextStats.kmvVocabulary(tbl(s, dir, "documents"), "source", "text",
        k = 128)),

    // ---- per-domain cap: top-25 docs per source by quality through the
    //      bounded-heap aggregate — anti-domination without a window ----
    "q97_domain_cap" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      graft.operators.Sampling.perDomainCap(
        docs.select(col("source"), col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality")),
        "doc_id", "source", "quality", n = 25)
    }),

    // ---- batch BM25: a TABLE of term queries in one pass — contributions
    //      fixed-pointed to micro-nats so per-(qid, doc) totals are integer
    //      sums; per-qid top-k through the bounded-heap aggregate ----
    "q84_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val queries = Bm25BatchQueries.toDF("qid", "term")
      graft.operators.Retrieval.bm25TopKBatch(tbl(s, dir, "documents"), "doc_id", "text",
        queries, k = 10)
    }),

    // ---- retrieval evaluation: q84's batch ranking scored against the
    //      "contains ALL query terms" ground truth — precision/recall@k,
    //      reciprocal rank AND nDCG@k; the log2 discounts are driver-side
    //      fixed-point LITERALS (Retrieval.ndcgWeightsFp) inlined into
    //      both engines, so even nDCG is integer-summed and oracle-exact ----
    "q86_retrieval_eval" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val qt = Bm25BatchQueries.toDF("qid", "term")
      val ranked = graft.operators.Retrieval.bm25TopKBatch(docs, "doc_id", "text", qt, k = 10)
      val nTerms = qt.groupBy("qid").agg(countDistinct("term").as("n_terms"))
      val toksD = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok")).distinct()
      val truth = toksD
        .join(broadcast(qt.withColumnRenamed("term", "tok")), "tok")
        .groupBy("qid", "doc_id").agg(count(lit(1)).as("n_match"))
        .join(broadcast(nTerms), "qid")
        .filter(col("n_match") === col("n_terms"))
        .select("qid", "doc_id")
      graft.operators.Retrieval.rankedEval(ranked, truth, k = 10)
    }),

    // ---- phrase BM25: the same scorer over 2-gram shingles — exact
    //      contiguous phrase matching with tf = phrase occurrences,
    //      dl = shingle count, df = docs containing the phrase ----
    "q87_phrase_bm25" -> ((s, dir) =>
      graft.operators.Retrieval.bm25PhraseTopK(tbl(s, dir, "documents"), "doc_id", "text",
        Bm25Phrases, n = 2, k = 10)),

    // ---- multimodal dedup: perceptual hashes (aHash + dHash) from REAL
    //      decoded pixels; integer-only resize/threshold arithmetic, hashes
    //      carried as 32-bit halves so the oracle's SUM-of-powers
    //      reconstruction stays BIGINT-exact ----
    "q88_image_phash" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"))
      graft.multimodal.MediaOps.imagePhash(graft.multimodal.MediaOps.syntheticPngs(ids))
    }),

    // ---- image near-dup detection: planted brightness-shifted variants
    //      (top source row +60) against their originals; dHash is
    //      gradient-sign based so rows 1-7 keep identical bits and the
    //      banded Hamming join recovers every planted pair ----
    "q89_phash_neardup" -> ((s, dir) => {
      val m = graft.multimodal.MediaOps
      val base = tbl(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"))
      val variants = tbl(s, dir, "documents").filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("id"))
      val media = m.syntheticPngs(base)
        .unionAll(m.syntheticPngVariants(variants, delta = 60, idOffset = 100000L))
      val hashes = m.imagePhash(media)
      Dedup.hammingNearDupPairs(hashes, "id", "dhash_hi", "dhash_lo",
        maxHamming = 8, maxBand = 1000)
    }),

    // ---- image ingest dedup: an arriving batch (planted variants + fresh
    //      images) statused against the corpus fingerprints — the
    //      incremental-dedup contract on the image column; batch twin of
    //      StreamingOps.streamingImageDedup ----
    "q95_image_ingest_dedup" -> ((s, dir) => {
      val m = graft.multimodal.MediaOps
      val docs = tbl(s, dir, "documents")
      val corpusH = m.imagePhash(m.syntheticPngs(
        docs.filter(col("doc_id") % 5 === 0).select(col("doc_id").as("id"))))
      val batch = m.syntheticPngVariants(
          docs.filter(col("doc_id") % 10 === 0).select(col("doc_id").as("id")),
          delta = 60, idOffset = 100000L)
        .unionAll(m.syntheticPngs(
          docs.filter(col("doc_id") % 5 === 2).select(col("doc_id").as("id"))))
      Dedup.hammingCorpusDedup(m.imagePhash(batch), corpusH,
        "id", "dhash_hi", "dhash_lo", maxHamming = 8, maxBand = 1000)
    }),

    // ---- frame-level audio features: per-frame energy / zero-crossings /
    //      peak from REAL decoded PCM (time-domain integers only — FFT is
    //      not cross-engine-exact; these carry the curation signal) ----
    "q90_audio_frames" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id"))
      graft.multimodal.MediaOps.audioFrameFeatures(
        graft.multimodal.MediaOps.syntheticWavs(ids), frameLen = 16)
    }),

    // ---- training-shard export: the deterministic per-epoch global
    //      shuffle (md5-prefix hash of "epoch|id" -> shard + in-shard
    //      position); 2 epochs to show the between-epoch reshuffle ----
    "q91_shard_assign" -> ((s, dir) =>
      graft.operators.Packing.shardAssign(
        tbl(s, dir, "documents"), "doc_id", numShards = 8, epochs = 2)),

    // ---- corpus datacard: the per-(source, lang) composition table a
    //      dataset release publishes — volumes, duplication, exact length
    //      quantiles ----
    "q92_datacard" -> ((s, dir) =>
      graft.operators.TextStats.datacard(
        tbl(s, dir, "documents"), "source", "lang", "text")),

    // ---- tf-idf-weighted hashed BoW: per-bucket document frequency
    //      down-weights collision-heavy buckets; weights are integer
    //      micro-nat products (tf · idf_fp) — the feature tier's
    //      importance-weighted form ----
    "q85_tfidf_bow" -> ((s, dir) =>
      graft.operators.Features.tfidfBow(tbl(s, dir, "documents"), "doc_id", "text", dim = 64)),

    // ---- hybrid retrieval through the REAL ANN index: BM25 ranking fused
    //      with the HNSW traversal's ranking (rows-only — ANN output is
    //      not SQL-oracle-able; rrfFuse itself is oracle-checked in q82) ----
    "hnsw_hybrid_rrf" -> ((s, dir) => {
      val idx = builtIndex(s, dir)
      val q42 = idx.nodes.filter(col("id") === 42L).select(col("id").as("qid"), col("vector"))
      val vec = Hnsw.annQuery(idx, q42, k = 20).select(col("id").as("doc_id"), col("rank"))
      val lex = graft.operators.Retrieval.bm25RankedTopK(
        tbl(s, dir, "documents"), "doc_id", "text", Bm25Terms, k = 20)
      graft.operators.Retrieval.rrfFuse(lex, vec, "doc_id", k0 = 60, k = 10)
    }),

    // ---- training-mixture table: per-source token share + temperature-0.5
    //      relative sampling weight (sqrt share, exact-arithmetic form) ----
    "q49_mixture_weights" -> ((s, dir) =>
      graft.operators.Sampling.mixtureWeights(tbl(s, dir, "documents"), "source", "text")),

    // ---- context-window chunking: overlapping token windows per doc
    //      (shuffle-free projection + explode; chunk text oracle-exact) ----
    "q51_chunk_windows" -> ((s, dir) =>
      graft.operators.Packing.chunkWindows(tbl(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)),

    // ---- cross-source duplication matrix: LSH near-dup pairs counted per
    //      unordered source pair (the crawl-audit table) ----
    "q52_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlapMatrix(tbl(s, dir, "documents"), "doc_id", "text", "source")),

    // ---- exact n-gram Jaccard over shingle-sharing pairs; maxDf drops
    //      ubiquitous stop-shingles before the self-join (the hot-shingle
    //      B² guard — mirrored in the oracle) ----
    "q13_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.2, maxDf = 5)),

    // ---- language-ID heuristic (relational scale form) ----
    "q14_langid" -> ((s, dir) =>
      graft.operators.TextStats.textStats(tbl(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "pred_lang")),

    // ---- quality scoring (length/stopword/word-length heuristics) ----
    "q15_quality" -> ((s, dir) =>
      graft.operators.TextStats.textStats(tbl(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_tokens", "quality")),

    // ---- document fingerprinting ----
    "q16_fingerprint" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))),

    // ---- embedding-cosine near-dup pairs (blocked by label; hot blocks
    //      capped — oracle-mirrored) ----
    "q17_embed_neardup" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("vector"), col("label"))
      Dedup.embeddingNearDupPairs(e, "vec_id", "vector", "label", maxDist = 0.65, maxBlock = 1000)
        .withColumnRenamed("id_a", "vec_a").withColumnRenamed("id_b", "vec_b")
    }),

    // ---- embedding near-dup, LSH-bucket blocked (the 100 TB path: no
    //      label dependence — blocking key is a sign-pattern hash of the
    //      vector itself; hot buckets capped) ----
    "q33_embed_neardup_lsh" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("vector"),
          Dedup.embeddingBucket(col("embedding"), EmbDim, bits = 8).as("bucket"))
      Dedup.embeddingNearDupPairs(e, "vec_id", "vector", "bucket", maxDist = 0.65, maxBlock = 1000)
        .withColumnRenamed("id_a", "vec_a").withColumnRenamed("id_b", "vec_b")
    }),

    // ---- SemDeDup end-to-end: q33's blocked cosine pairs -> q36's
    //      connected components -> per-row keep/drop verdict, as ONE
    //      declarative plan (near-dup is not transitive, so the verdict
    //      needs the cluster, not the pair list) ----
    "q74_semantic_dedup" -> ((s, dir) =>
      Dedup.semanticDedup(
        tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", EmbDim, bits = 8, maxDist = 0.65, maxBlock = 1000)),

    // ---- incremental semantic dedup: q48's ingest split in embedding
    //      space — new embeddings statused against the corpus by blocked
    //      cosine proximity (the paraphrase tier of the ingest ladder) ----
    "q78_incremental_semdedup" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val corpus = e.filter(col("vec_id") % 10 >= 2).select(col("vec_id"), col("embedding"))
      val newBatch = e.filter(col("vec_id") % 10 < 2).select(col("vec_id"), col("embedding"))
      Dedup.incrementalSemanticDedup(newBatch, corpus, "vec_id", "embedding", EmbDim,
        bits = 8, maxDist = 0.65, maxBlock = 1000)
    }),

    // ---- semantic decontamination: training embeddings statused against
    //      a benchmark slice by blocked cosine proximity, the offending
    //      eval item attributed — q39's contamination check for leakage
    //      that entered the training set REWORDED ----
    "q98_semantic_decontam" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val bench = e.filter(col("vec_id") % 7 === 3).select(col("vec_id"), col("embedding"))
      val train = e.filter(col("vec_id") % 7 =!= 3).select(col("vec_id"), col("embedding"))
      Dedup.semanticDecontaminate(train, bench, "vec_id", "embedding", EmbDim,
        bits = 8, maxDist = 0.65, maxBlock = 1000)
    }),

    // ---- IVF: cell assignment (map-side argmin vs broadcast centroids) ----
    "q18_ivf_assign" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = e.filter(col("id") < 10).select(col("id").as("cid"), col("vector").as("cvector"))
      Ivf.assign(e.select("id", "vector"), centroids, Distances.l2)
    }),

    // ---- IVF: nprobe-bucketed approximate top-k search ----
    "q19_ivf_search" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = e.filter(col("id") < 10).select(col("id").as("cid"), col("vector").as("cvector"))
      val assigned = Ivf.assign(e.select("id", "vector"), centroids, Distances.l2)
        .join(e.select("id", "vector"), "id")
      val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      Ivf.search(assigned, queries, centroids, k = 5, nprobe = 3, Distances.l2)
    }),

    // ---- exact k-means: Lloyd training in fixed-point integers, so the
    //      TRAINED clustering (not just assignment) is oracle-exact;
    //      2 iterations from the k-smallest-id seeds ----
    "q93_kmeans_exact" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.Ivf.kmeansExact(e.select("id", "vector"), k = 8, iters = 2)
    }),

    // ---- cluster datacard: per-cluster membership and inertia from the
    //      exact clustering — the composition table cluster-balanced
    //      curation samples against ----
    "q94_cluster_card" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.Ivf.kmeansExact(e.select("id", "vector"), k = 8, iters = 2)
        .groupBy("cid")
        .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("inertia"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    }),

    // ---- SimHash signatures (relational, 16-bit) ----
    "q20_simhash" -> ((s, dir) =>
      Dedup.simhashRelational(tbl(s, dir, "documents"), "doc_id", "text", bits = 16)),

    // ---- general analytics: event-time hourly window aggregation ----
    // (batch twin of the Structured Streaming windowed-agg path; exact-only
    //  aggregates — sums of non-integral doubles are order-dependent)
    "q21_event_window" -> ((s, dir) =>
      // hour-truncate to epoch seconds with exact integer arithmetic
      // (timestamp types round-trip differently across engines; integers
      // compare exactly); ts encoding handled by eventsMicros
      eventsMicros(s, dir)
        .groupBy(
          expr("(tus DIV 3600000000) * 3600").as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))),

    // ---- partial-aggregate scan query (map-side combine; integral sums are exact) ----
    "q22_lineitem_agg" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          countDistinct(col("l_orderkey")).as("n_orders"))),

    // ---- broadcast dimension join + predicate pushdown ----
    "q23_join_segment" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val cust = tbl(s, dir, "customer").select("c_custkey", "c_mktsegment")
      orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_price"))
    }),

    // ---- multimodal: binary payload + typed metadata projection ----
    "q24_media_meta" -> ((s, dir) => {
      val media = graft.multimodal.MediaOps.fromText(tbl(s, dir, "documents"), "doc_id", "text")
      media.select(col("id"), col("kind"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("fp"),
        expr("CAST((length(content) + 15) DIV 16 AS BIGINT)").as("n_frames"))
    }),

    // ---- multimodal: frame sampling over the binary payload (typed Dataset path) ----
    "q25_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.MediaOps.fromText(tbl(s, dir, "documents"), "doc_id", "text")
        .as[graft.multimodal.MediaRow]
      val frames = graft.multimodal.MediaOps.sampleFrames(media, stride = 2)
      val counts = frames.groupBy("id").agg(count(lit(1)).as("n_sampled"))
      val first = frames.filter(col("frame_idx") === 0)
        .select(col("id"), hex(col("frame")).as("first_frame_hex"))
      counts.join(first, "id")
    }),

    // ---- B1–B6: distributed HNSW build (rows-only check; graph is stochastic-ish but deterministic given params) ----
    "hnsw_build_stats" -> ((s, dir) => {
      val idx = builtIndex(s, dir)
      idx.edges.groupBy("layer").agg(count(lit(1)).as("n_edges")).orderBy("layer")
    }),

    // ---- Karp–Rabin rolling hash over token streams ----
    "q26_rolling_hash" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.rollingHash(col("text")).as("rhash"))),

    // ---- composite cleaning pipeline: quality filter → dedup keep → lang distribution ----
    // Single pass: the stats subtree is evaluated ONCE (no self-join back
    // through exactDedup — that shape re-derived the explode+agg subtree per
    // join side). Canonical doc per fingerprint = min (doc_id, pred_lang)
    // struct, a partial-aggregable min (map-side combine) instead of a
    // window over fp.
    "q27_clean_pipeline" -> ((s, dir) => {
      val kept = graft.operators.TextStats.textStats(tbl(s, dir, "documents"), "doc_id", "text")
        .filter(col("quality") >= 0.55)
      kept
        .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(min(struct(col("doc_id"), col("pred_lang"))).as("c"))
        .groupBy(col("c.pred_lang").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // ---- BPE-ish subword token counting ----
    "q28_bpe_tokens" -> ((s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"))),

    // ---- gap-based sessionization (window lag + running sum; exact ns ints) ----
    "q29_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
      val e = eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("tus").as("t"))
      e.withColumn("brk",
          when(col("t") - lag(col("t"), 1).over(byUser) > 600000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("t")).as("session_start_us"), count(lit(1)).as("n_events"))
    }),

    // ---- semi-structured: JSON property extraction from the event stream ----
    "q30_json_extract" -> ((s, dir) =>
      tbl(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") >= 50)),

    // ---- vector normalization projection (unit L2 norm; zero vector preserved) ----
    // Output exploded to scalar rows (id, pos, component) so the oracle
    // compare stays array-free; the division is per-component and
    // bit-identical either way.
    "q31_normalize" -> ((s, dir) => {
      val e = emb(s, dir)
      // norm materialized in its own projection so the division uses a
      // column, not a re-evaluated expression (lambda bodies skip CSE)
      e.select(col("id"), col("vector"), Distances.norm(col("vector")).as("n"))
        .select(col("id"), col("n"), posexplode(col("vector")).as(Seq("pos", "x")))
        .select(col("id"), col("pos"),
          when(col("n") === 0.0, col("x").cast("double"))
            .otherwise(col("x").cast("double") / col("n")).as("component"))
    }),

    // ---- int8 scalar quantization of the embedding column (4x footprint
    //      cut before index/rescore IO; codes exact at any parallelism) ----
    "q34_quantize" -> ((s, dir) =>
      graft.operators.Quantize.scalarQuantize(
        tbl(s, dir, "embeddings").select(col("vec_id").as("id"), col("embedding").as("vector")),
        "id", "vector", bits = 8)),

    // ---- skew-safe salted aggregation (two-phase; identical result to a
    //      plain groupBy count — the salt only reshapes the shuffle) ----
    "q37_salted_count" -> ((s, dir) =>
      graft.operators.Skew.saltedCount(
        tbl(s, dir, "lineitem").select("l_returnflag"), "l_returnflag", saltBuckets = 16)),

    // ---- rollup analytics: subtotals + grand total in one pass (exact
    //      aggregates only: counts, min/max, integral sums) ----
    "q38_rollup" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          max(col("l_extendedprice")).as("max_price"))),

    // ---- as-of join: each click matched to the user's latest prior purchase ----
    "q32_asof_join" -> ((s, dir) => {
      val e = eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("tus").as("t"), col("event_type"))
      val clicks = e.filter(col("event_type") === "click").select("user_id", "t", "event_id")
      val purchases = e.filter(col("event_type") === "purchase").select("user_id", "t")
      graft.operators.AsOf.asOfJoin(clicks, purchases, "user_id", "t", "last_purchase_t")
        .select("event_id", "user_id", "t", "last_purchase_t")
    }),

    // ---- bounded range join (bucketed equi-join, no BNLJ): clicks within
    //      1 hour after each purchase by the same user ----
    "q35_range_join" -> ((s, dir) => {
      val e = eventsMicros(s, dir)
        .select(col("user_id"), col("event_id"), col("tus").as("t"), col("event_type"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event"), col("t").as("pt"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_event"), col("t").as("ct"))
      graft.operators.RangeJoin
        .boundedRangeJoin(purchases, clicks, Seq("user_id"), "pt", "ct", 0L, 3600000000L)
        .select(col("p_event"), col("c_event"), (col("ct") - col("pt")).as("dt"))
    }),

    // ---- IVF-PQ end-to-end on the shared embeddings: trained coarse cells
    //      + per-sub-block codebooks, ADC scoring over codes (rows-only:
    //      approximate by construction, like the hnsw_* entries) ----
    "ivfpq_topk" -> ((s, dir) => {
      val (centroids, codebooks, assignedCodes) = ivfpqArtifacts(s, dir)
      val e = emb(s, dir)
      val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      graft.operators.Pq.ivfPqTopK(assignedCodes, codebooks, centroids, queries,
        EmbDim, m = 8, k = 10, nprobe = 4)
    }),

    // ---- recall of the refined IVF-PQ path vs the exact oracle (rows-only):
    //      ADC prune to 50 candidates, exact rescore of only those ----
    "ivfpq_recall" -> ((s, dir) => {
      val (centroids, codebooks, assignedCodes) = ivfpqArtifacts(s, dir)
      val e = emb(s, dir).select("id", "vector")
      val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      val ann = graft.operators.Pq.ivfPqTopKRefined(assignedCodes, codebooks, centroids,
        queries, e, EmbDim, m = 8, k = 10, nprobe = 8, refine = 50)
      val exact = Knn.exactTopK(e, queries, 10, Distances.l2)
      Hnsw.recallAtK(ann, exact, 10)
        .agg(avg(col("recall")).as("avg_recall"), count(lit(1)).as("n_queries"))
    }),

    // ---- §7.4.1c: cross-partition merge into one navigable graph,
    //      re-sharded for distributed queries (rows-only). Stats are over
    //      LOGICAL edges (each edge is duplicated to both endpoints'
    //      query shards — dedup before counting). ----
    "hnsw_merge_stats" -> ((s, dir) => {
      val merged = graft.hnsw.HnswMerge.merge(builtIndex(s, dir), level0SampleMod = 8)
      merged.edges.select("src", "layer", "dst").distinct().groupBy("layer").agg(
        count(lit(1)).as("n_edges"),
        sum(when(pmod(col("src"), lit(8L)) =!= pmod(col("dst"), lit(8L)), 1L).otherwise(0L))
          .as("n_cross_partition")).orderBy("layer")
    }),

    // ---- filtered exact kNN: top-k under an attribute predicate — the
    //      exact twin of the filtered ANN path, oracle-checked ----
    "q50_filtered_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      Knn.exactTopK(e.filter(col("label") % 3 === 0), queries, 10, Distances.l2)
    }),

    // ---- filtered ANN over the built index (rows-only; predicate
    //      correctness + recall vs q50's exact form are spec-asserted) ----
    "hnsw_ann_filtered" -> ((s, dir) => {
      val idx = builtIndex(s, dir)
      val e = emb(s, dir)
      val queries = idx.nodes.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      // selectivity ≈ 1/3 → ef widened to ~3× the unfiltered budget
      Hnsw.annQueryFiltered(idx, queries, k = 10,
        allowedIds = e.filter(col("label") % 3 === 0).select("id"), ef = 192)
    }),

    // ---- Q1b: batch ANN query over the built index (rows-only) ----
    "hnsw_ann_topk" -> ((s, dir) => {
      val idx = builtIndex(s, dir)
      val queries = idx.nodes.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      Hnsw.annQuery(idx, queries, k = 10)
    }),

    // ---- Q1b at scale: distributed batch ANN with no driver round-trip
    //      (query table replicated to shards, one shuffle; rows-only —
    //      spec-asserted bit-equal to annQuery) ----
    "hnsw_ann_topk_large" -> ((s, dir) => {
      val idx = builtIndex(s, dir)
      val queries = idx.nodes.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      Hnsw.annQueryLarge(idx, queries, k = 10)
    }),

    // ---- Q1b at 100×: centroid-routed ANN over a locality-sharded index —
    //      each query probes its nearest quarter of the k-means cells and
    //      searches ONLY the shards owning them (per-query cost O(s·ef),
    //      not O(P·ef)); spill assignment keeps boundary recall
    //      (rows-only; recall vs all-shard spec-asserted in HnswRoutedSpec) ----
    "hnsw_ann_routed" -> ((s, dir) => {
      val idx = routedIndex(s, dir)
      val queries = emb(s, dir).filter(col("id") % 100 === 0)
        .select(col("id").as("qid"), col("vector"))
      Hnsw.annQueryRouted(idx, queries, k = 10)
    }),

    // ---- the exact-probed (IVF-Flat twin) path at FULL probe is the
    //      exact top-k by construction — the one ANN-family operator that
    //      is SQL-expressible, so unlike its hnsw_* siblings it gets a
    //      full hash oracle (q03's brute-force SQL): routing join, shard
    //      pruning, ghost dedup and the bounded-heap merge all must
    //      reproduce the oracle bit-for-bit ----
    "q122_routed_exact_full_probe" -> ((s, dir) => {
      val idx = routedIndex(s, dir)
      val queries = emb(s, dir).filter(col("id") % 100 === 0)
        .select(col("id").as("qid"), col("vector"))
      Hnsw.annQueryRoutedExact(idx, queries, k = 10, probeCells = idx.meta.num_cells)
    }),

    // ---- the broadcast-free exact-probed twin (annQueryRoutedExactLarge,
    //      the unbounded-query-set form the decay tier selects for big
    //      batches): same full-probe identity, same q03 oracle — the
    //      equi-join route must reproduce the brute force bit-for-bit ----
    "q145_routed_exact_large" -> ((s, dir) => {
      val idx = routedIndex(s, dir)
      val queries = emb(s, dir).filter(col("id") % 100 === 0)
        .select(col("id").as("qid"), col("vector"))
      Hnsw.annQueryRoutedExactLarge(idx, queries, k = 10, probeCells = idx.meta.num_cells)
    }),

    // ---- golden parity: the reference's committed experience end-to-end
    //      (CIFAR notebook cell-4 / README top-5 table) from real decoded
    //      image bytes — synthetic closed-form PNGs → javax.imageio decode
    //      → 8×8 nearest-neighbor resize → /255 float vectors → exact k=5
    //      ranked labeled report. PNG is lossless and float division is
    //      exactly rounded in IEEE, so a DuckDB oracle re-derives every
    //      vector component (and so every distance, rank and marker) from
    //      the pixel formula without touching an image ----
    "q76_golden_image_report" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"))
      val vecs = graft.multimodal.MediaOps.imageVectors(
        graft.multimodal.MediaOps.syntheticPngs(ids), side = 8)
      val queries = vecs.filter(col("id") % 25 === 0)
        .select(col("id").as("qid"), col("vector"))
      val labels = vecs.select(col("id"),
        concat(lit("class_"), (col("id") % 10).cast("string")).as("label_name"))
      Knn.rankedReport(vecs, queries, labels, k = 5, Distances.l2)
    }),

    // ---- golden parity through the REAL ANN path: every indexed image
    //      queries the built HNSW graph with its own vector; top-1 must be
    //      itself at distance exactly 0 (README.md:21-27's self-match row,
    //      the notebook's rank-1 "<- QUERY" line). The oracle is the
    //      closed-form identity table — any graph/search regression that
    //      breaks self-recall diffs against it ----
    "q77_golden_selfmatch" -> ((s, dir) => {
      val ids = tbl(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"))
      val vecs = graft.multimodal.MediaOps.imageVectors(
        graft.multimodal.MediaOps.syntheticPngs(ids), side = 8)
      val idx = Hnsw.build(vecs,
        HnswParams(dim = 64, m = 8, efConstruction = 64, numPartitions = 4))
      val queries = vecs.select(col("id").as("qid"), col("vector"))
      Hnsw.annQuery(idx, queries, k = 1)
        .select(col("qid"), col("id").as("match_id"), col("dist"))
    }),

    // ---- D8: recall@k of ANN vs exact oracle (rows-only; the reference's declared-but-missing eval) ----
    "hnsw_recall" -> ((s, dir) => {
      val idx = builtIndex(s, dir)
      val queries = idx.nodes.filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector"))
      val ann = Hnsw.annQuery(idx, queries, k = 10)
      val exact = Knn.exactTopK(
        emb(s, dir), emb(s, dir).filter(col("id") % 100 === 0).select(col("id").as("qid"), col("vector")),
        10, Distances.l2)
      Hnsw.recallAtK(ann, exact, 10)
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the hnsw_* graph queries (ANN is
    * not SQL-expressible; driver records a rows-only check).
    */
  /** Shared CTE chain of the BPE-trainer oracle (q79/q80): corpus word
    * vocabulary → double-space symbol strings → k rounds of (pair counts,
    * 1-row argmax b_i, vocabulary rewrite v_i). Mirrors
    * [[graft.operators.TextStats.bpeTrainMerges]] byte-for-byte.
    */
  /** Unrolled-CTE twin of [[graft.operators.Ivf.kmeansExact]]: `iters`
    * Lloyd rounds in fixed-point integers (points quantized once, argmin
    * by (dist, cid), means as floor division of non-negative sums, empty
    * cells keep their previous centroid). Ends with CTEs `pts` and
    * `cfinal` — the caller selects the final assignment from them.
    */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String = {
    val base =
      s"""ex AS (SELECT vec_id AS id, embedding AS v, unnest(generate_series(0, ${dim - 1})) AS d FROM embeddings),
         |pts AS (SELECT id, d, CAST(floor((CAST(v[d + 1] AS DOUBLE) + 4.0) * 1048576.0) AS BIGINT) AS qv FROM ex),
         |init AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS cid
         |  FROM (SELECT DISTINCT id FROM pts ORDER BY id LIMIT $k)),
         |c0 AS (SELECT i.cid, p.d, p.qv AS cv FROM init i JOIN pts p ON p.id = i.id)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""a${i}s AS (SELECT p.id, c.cid, SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dist
         |  FROM pts p JOIN c${i - 1} c ON c.d = p.d GROUP BY p.id, c.cid),
         |a$i AS (SELECT id, cid FROM (SELECT id, cid,
         |    row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn FROM a${i}s) WHERE rn = 1),
         |m$i AS (SELECT a.cid, p.d, CAST(SUM(p.qv) // COUNT(*) AS BIGINT) AS nv
         |  FROM a$i a JOIN pts p ON p.id = a.id GROUP BY a.cid, p.d),
         |c$i AS (SELECT c.cid, c.d, COALESCE(m.nv, c.cv) AS cv
         |  FROM c${i - 1} c LEFT JOIN m$i m ON m.cid = c.cid AND m.d = c.d)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s",\ncfinal AS (SELECT cid, d, cv FROM c$iters)"
  }

  /** Final (id, cid, dist) assignment select over [[kmeansCtes]] output. */
  private def kmeansAssignSql: String =
    s"""fs AS (SELECT p.id, c.cid, SUM((p.qv - c.cv) * (p.qv - c.cv)) AS dist
       |  FROM pts p JOIN cfinal c ON c.d = p.d GROUP BY p.id, c.cid),
       |fr AS (SELECT id, cid, CAST(dist AS BIGINT) AS dist FROM (
       |  SELECT id, cid, dist, row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn
       |  FROM fs) WHERE rn = 1)""".stripMargin

  private def bpeTrainCtes(k: Int): String = {
    val steps = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT ss[i] || ' ' || ss[i+1] AS pair, CAST(sum(n_tok) AS BIGINT) AS n_pair FROM (
         |    SELECT n_tok, ss, unnest(generate_series(1, len(ss) - 1)) AS i FROM (
         |      SELECT n_tok, string_split(sym, '  ') AS ss FROM v${i - 1}))
         |  GROUP BY 1),
         |b$i AS (SELECT pair, n_pair FROM p$i ORDER BY n_pair DESC, pair LIMIT 1),
         |v$i AS (SELECT n_tok,
         |  trim(replace(' ' || sym || ' ', ' ' || replace(b.pair, ' ', '  ') || ' ', ' ' || replace(b.pair, ' ', '') || ' ')) AS sym
         |  FROM v${i - 1}, b$i b)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1 HAVING len(tok) >= 2),
       |v0 AS (SELECT n_tok, array_to_string(list_transform(generate_series(1, len(tok)),
       |  j -> substr(tok, j, 1)), '  ') AS sym FROM vocab),
       |$steps""".stripMargin
  }

  /** Tokenizer-id oracle (q148/q149): the q79 trainer CTEs, the q80
    * replay chain, then id assignment — base vocabulary = binary-sorted
    * distinct corpus characters (row_number − 1), merge symbols at
    * nBase + rank − 1 with the FIRST rank winning when a later merge
    * re-derives the same string, unk = −1. Ends with CTE
    * `ids (doc_id, tpos, spos, token_id)`; `trailer` is the final select
    * (or further CTEs + select when `trailerIsCte`). Mirrors
    * [[graft.operators.TextStats.bpeVocab]]/[[graft.operators.TextStats
    * .bpeEncodeIds]] byte-for-byte (same split, same padded replace
    * chain, same bytewise string sort both engines default to).
    */
  private def bpeIdsOracle(trailer: String, trailerIsCte: Boolean = false): String = {
    val k = 5
    val applied = (1 to k).foldLeft("s0") { (acc, i) =>
      s"replace($acc, ' ' || (SELECT replace(pair, ' ', '  ') FROM b$i) || ' ', ' ' || (SELECT replace(pair, ' ', '') FROM b$i) || ' ')"
    }
    val mergeRows = (1 to k).map(i =>
      s"SELECT CAST($i AS INT) AS rank, (SELECT replace(pair, ' ', '') FROM b$i) AS sym")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeTrainCtes(k)},
       |atoks AS (SELECT w[i] AS tok FROM (
       |  SELECT w, unnest(generate_series(1, len(w))) AS i FROM (
       |    SELECT string_split(text, ' ') AS w FROM documents)) WHERE len(w[i]) >= 1),
       |basechars AS (SELECT DISTINCT substr(tok, j, 1) AS sym FROM (
       |  SELECT tok, unnest(generate_series(1, len(tok))) AS j FROM atoks)),
       |base AS (SELECT sym, CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS token_id
       |  FROM basechars),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       |mg AS ($mergeRows),
       |vall AS (SELECT sym, token_id FROM base
       |  UNION ALL SELECT mg.sym, nb.n + mg.rank - 1 AS token_id FROM mg, nb),
       |vfinal AS (SELECT sym, CAST(MIN(token_id) AS BIGINT) AS token_id FROM vall GROUP BY 1),
       |dtoks2 AS (SELECT doc_id, i AS tpos, w[i] AS tok FROM (
       |  SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM (
       |    SELECT doc_id, string_split(text, ' ') AS w FROM documents)) WHERE len(w[i]) >= 1),
       |seg AS (SELECT doc_id, tpos,
       |  ' ' || array_to_string(list_transform(generate_series(1, len(tok)),
       |    j -> substr(tok, j, 1)), '  ') || ' ' AS s0
       |  FROM dtoks2),
       |syms AS (SELECT doc_id, tpos, spos, ss[spos] AS sym FROM (
       |  SELECT doc_id, tpos, ss, unnest(generate_series(1, len(ss))) AS spos FROM (
       |    SELECT doc_id, tpos, string_split(trim($applied), '  ') AS ss FROM seg))),
       |ids AS (SELECT s.doc_id, s.tpos, s.spos,
       |    COALESCE(v.token_id, CAST(-1 AS BIGINT)) AS token_id
       |  FROM syms s LEFT JOIN vfinal v ON v.sym = s.sym)${if (trailerIsCte) "," else ""}
       |$trailer""".stripMargin
  }

  /** Shared CTE chain of the BM25 oracle (q81/q82): token stream → doc
    * lengths → corpus totals → query-term tf/df → fixed-point micro-nat
    * idf → per-(doc,term) contribution → fixed-order per-term score
    * chain. Mirrors [[graft.operators.Retrieval.bm25TopK]] bit-for-bit
    * (integer arithmetic + fixed-association IEEE ops; `ln` rounded once
    * per distinct term). Final CTE: `bmscore (doc_id, bm25)`.
    */
  private def bm25Ctes(terms: Seq[String],
      tokSql: String = "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents")
      : String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val caseCols = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN tok = '$t' THEN c END) AS c_$i"
    }.mkString(", ")
    val chain = terms.indices.map(i => s"COALESCE(c_$i, 0.0)").mkString(" + ")
    s"""bmtoks AS ($tokSql),
       |bmdl AS (SELECT doc_id, count(*) AS dl FROM bmtoks GROUP BY 1),
       |bmstats AS (SELECT count(*) AS nd, sum(dl) AS lt FROM bmdl),
       |bmtf AS (SELECT doc_id, tok, count(*) AS tf FROM bmtoks WHERE tok IN ($inList) GROUP BY 1, 2),
       |bmdf AS (SELECT tok, count(*) AS df FROM bmtf GROUP BY 1),
       |bmidf AS (SELECT tok,
       |  CAST(floor(ln((2.0 * (nd + 1)) / (df * 2 + 1)) * 1000000.0 + 0.5) AS BIGINT) AS idf_fp
       |  FROM bmdf, bmstats),
       |bmpairs AS (SELECT t.doc_id, t.tok,
       |    (CAST(i.idf_fp AS DOUBLE) / 1000000.0) *
       |    (CAST(t.tf * 22 * s.lt AS DOUBLE) /
       |     CAST(t.tf * 10 * s.lt + 3 * s.lt + d.dl * 9 * s.nd AS DOUBLE)) AS c
       |  FROM bmtf t JOIN bmdl d USING (doc_id) JOIN bmidf i USING (tok), bmstats s),
       |bmg AS (SELECT doc_id, $caseCols FROM bmpairs GROUP BY 1),
       |bmscore AS (SELECT doc_id, $chain AS bm25 FROM bmg)""".stripMargin
  }

  /** Shared CTE chain of the batch-BM25 oracle (q84/q86): the q81 dataflow
    * generalized to a VALUES query table, with per-(doc, term)
    * contributions fixed-pointed to micro-nat BIGINTs so per-(qid, doc)
    * totals are integer sums. Mirrors
    * [[graft.operators.Retrieval.bm25TopKBatch]] bit-for-bit. Final CTE:
    * `bmranked (qid, doc_id, score_fp, "rank")`.
    */
  private def bm25BatchCtes: String = {
    val values = Bm25BatchQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""qt AS (SELECT * FROM (VALUES $values) AS t(qid, tok)),
       |bmtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |bmdl AS (SELECT doc_id, count(*) AS dl FROM bmtoks GROUP BY 1),
       |bmstats AS (SELECT count(*) AS nd, sum(dl) AS lt FROM bmdl),
       |wanted AS (SELECT DISTINCT tok FROM qt),
       |bmtf AS (SELECT doc_id, tok, count(*) AS tf FROM bmtoks JOIN wanted USING (tok) GROUP BY 1, 2),
       |bmdf AS (SELECT tok, count(*) AS df FROM bmtf GROUP BY 1),
       |bmidf AS (SELECT tok,
       |  CAST(floor(ln((2.0 * (nd + 1)) / (df * 2 + 1)) * 1000000.0 + 0.5) AS BIGINT) AS idf_fp
       |  FROM bmdf, bmstats),
       |contrib AS (SELECT t.doc_id, t.tok,
       |    CAST(floor(((CAST(i.idf_fp AS DOUBLE) / 1000000.0) *
       |      (CAST(t.tf * 22 * s.lt AS DOUBLE) /
       |       CAST(t.tf * 10 * s.lt + 3 * s.lt + d.dl * 9 * s.nd AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS c_fp
       |  FROM bmtf t JOIN bmdl d USING (doc_id) JOIN bmidf i USING (tok), bmstats s),
       |bmsc AS (SELECT q.qid, c.doc_id, CAST(sum(c.c_fp) AS BIGINT) AS score_fp
       |  FROM contrib c JOIN qt q USING (tok) GROUP BY 1, 2),
       |bmranked AS (SELECT qid, doc_id, score_fp,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY score_fp DESC, doc_id) AS INT) AS "rank"
       |  FROM bmsc)""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    import OracleSql._
    // q101's NB model + q102's held-out scoring as a reusable CTE chain
    // (shared by q102 and the q132 calibration sweep built on its scores)
    val nbScoreCtes =
      s"""train AS (SELECT CASE WHEN source IN $nbCuratedSql THEN 1 ELSE 0 END AS cls, text
         |  FROM documents WHERE doc_id % 2 = 0),
         |toks AS (SELECT cls, unnest(string_split(text, ' ')) AS tok FROM train),
         |wc AS (SELECT tok, cls, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
         |vocab AS (SELECT DISTINCT tok FROM wc),
         |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
         |nc AS (SELECT cls, CAST(sum(n) AS BIGINT) AS n_c FROM wc GROUP BY 1),
         |grid AS (SELECT tok, c.cls FROM vocab, (SELECT 0 AS cls UNION ALL SELECT 1) c),
         |model AS (SELECT g.tok, g.cls,
         |    CAST(floor(ln(CAST(COALESCE(w.n, 0) + 1 AS DOUBLE) / CAST(nc.n_c + v.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_fp
         |  FROM grid g LEFT JOIN wc w ON w.tok = g.tok AND w.cls = g.cls
         |  JOIN nc ON nc.cls = g.cls, v),
         |ht AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE doc_id % 2 = 1),
         |hc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n FROM ht GROUP BY 1, 2),
         |sc AS (SELECT h.doc_id,
         |    CAST(sum(CASE WHEN m.cls = 1 THEN h.n ELSE 0 END) AS BIGINT) AS n_known,
         |    CAST(sum(CASE WHEN m.cls = 1 THEN h.n * m.lp_fp ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN m.cls = 0 THEN h.n * m.lp_fp ELSE 0 END) AS BIGINT) AS s0
         |  FROM hc h JOIN model m ON m.tok = h.tok GROUP BY 1),
         |nd AS (SELECT CASE WHEN source IN $nbCuratedSql THEN 1 ELSE 0 END AS cls,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM nd),
         |pr AS (SELECT cls, CAST(floor(ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS prior_fp
         |  FROM nd, tot),
         |p1 AS (SELECT prior_fp AS p1 FROM pr WHERE cls = 1),
         |p0 AS (SELECT prior_fp AS p0 FROM pr WHERE cls = 0)""".stripMargin
    val knnDist = l2Sql("e.embedding", "q.embedding", EmbDim)
    // language-ID CASE over a given text expression (shared by q14/q27)
    def langCase(textExpr: String): String = {
      val scores = TextFunctions.LangMarkers.map { case (lang, markers) =>
        lang -> stopCountSql(textExpr, markers)
      }
      val best = s"greatest(${scores.map(_._2).mkString(", ")})"
      val cases = scores.map { case (lang, sc) =>
        s"WHEN $sc = $best AND $sc > 0 THEN '$lang'"
      }.mkString(" ")
      s"CASE $cases ELSE 'und' END"
    }
    // quality-score expression over documents.text (shared by q15/q27)
    val qualityExpr: String = {
      val nTok = s"CAST(${tokenCountSql("text")} AS DOUBLE)"
      val nStop = s"CAST(${stopCountSql("text", TextFunctions.Stopwords)} AS DOUBLE)"
      val nChar = "CAST(length(text) AS DOUBLE)"
      val meanLen = s"($nChar - ($nTok - 1.0)) / $nTok"
      val lenOk = s"CASE WHEN $nChar >= 100.0 AND $nChar <= 2000.0 THEN 1.0 ELSE 0.0 END"
      val wordOk = s"CASE WHEN $meanLen >= 3.0 AND $meanLen <= 12.0 THEN 1.0 ELSE 0.0 END"
      s"($nStop / $nTok) * 0.4 + $lenOk * 0.3 + $wordOk * 0.3"
    }
  /** q119's oracle SQL — the full verdict CTE chain, shared verbatim by
    * the q119 row and (as a nested-WITH CTE) the q120 budget row.
    */
    def q119Sql: String = {
      val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 2),
           |newd AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 10 < 2
           |  UNION ALL SELECT doc_id + 10000 AS doc_id, source, text FROM documents
           |    WHERE doc_id % 10 >= 2 AND doc_id % 50 = 7),
           |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM newd),
           |a AS (SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(len(tok)) AS BIGINT) AS sum_len,
           |  CAST(max(len(tok)) AS BIGINT) AS max_word_len,
           |  count(DISTINCT tok) AS n_distinct,
           |  CAST(sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
           |  FROM w GROUP BY 1),
           |keepg AS (SELECT doc_id FROM a
           |  WHERE n_words >= 30 AND n_words <= 100000
           |    AND CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
           |    AND CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0
           |    AND n_stop >= 2
           |    AND 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.55
           |    AND max_word_len <= 15),
           |gated AS (SELECT n.doc_id, n.text FROM newd n
           |  JOIN keepg USING (doc_id) WHERE $qualityExpr >= 0.3),
           |${shingleCteFrom(3, "corp", "csh_raw")},
           |${shingleCteFrom(3, "gated", "nsh_raw")},
           |csd AS (SELECT DISTINCT doc_id, shingle FROM csh_raw),
           |cdf AS (SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM csd),
           |csh AS (SELECT doc_id, shingle FROM cdf WHERE df <= 5),
           |hot AS (SELECT DISTINCT shingle FROM cdf WHERE df > 5),
           |nsd AS (SELECT DISTINCT doc_id, shingle FROM nsh_raw),
           |nsh AS (SELECT doc_id, shingle FROM nsd WHERE shingle NOT IN (SELECT shingle FROM hot)),
           |na AS (SELECT doc_id, count(*) AS n_a FROM nsh GROUP BY 1),
           |nb AS (SELECT doc_id, count(*) AS n_b FROM csh GROUP BY 1),
           |inter AS (SELECT a.doc_id AS id_new, b.doc_id AS id_corp, count(*) AS n_inter
           |  FROM nsh a JOIN csh b ON a.shingle = b.shingle GROUP BY 1, 2),
           |jac AS (SELECT id_new,
           |    CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS j
           |  FROM inter JOIN na ON na.doc_id = inter.id_new JOIN nb ON nb.doc_id = inter.id_corp),
           |near AS (SELECT id_new, count(*) AS n_near, max(j) AS bj
           |  FROM jac WHERE j >= 0.2 GROUP BY 1),
           |ex AS (SELECT DISTINCT g.doc_id FROM gated g
           |  JOIN corp c ON md5(lower(g.text)) = md5(lower(c.text)))
           |SELECT nd.doc_id, nd.source,
           |  CASE WHEN g.doc_id IS NULL THEN 'rejected_quality'
           |       WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
           |       WHEN near.id_new IS NOT NULL THEN 'near_dup'
           |       ELSE 'new' END AS status,
           |  CAST(${tokenCountSql("nd.text")} AS BIGINT) AS n_tok,
           |  CAST(floor((${qualityExpr.replace("text", "nd.text")}) * 1000) AS BIGINT) AS bin,
           |  COALESCE(near.n_near, 0) AS n_near_matches,
           |  COALESCE(near.bj, 0.0) AS best_jaccard
           |FROM newd nd
           |  LEFT JOIN gated g ON g.doc_id = nd.doc_id
           |  LEFT JOIN ex ON ex.doc_id = nd.doc_id
           |  LEFT JOIN near ON near.id_new = nd.doc_id""".stripMargin
  }

    Map(
      "q01_l2_project" -> {
        val terms = Seq(
          ("l_quantity", "25.0"),
          ("(l_extendedprice / 1000.0)", "30.0"),
          ("(l_discount * 10.0)", "2.5"),
          ("(l_tax * 10.0)", "0.4"),
        ).map { case (a, b) => s"($a - $b) * ($a - $b)" }.mkString(" + ")
        s"SELECT l_orderkey, l_linenumber, sqrt($terms) AS dist FROM lineitem"
      },

      "q02_cosine_project" ->
        s"""SELECT e.vec_id AS id, ${cosineSql("e.embedding", "q.embedding", EmbDim)} AS dist
           |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q""".stripMargin,

      "q03_knn_topk" ->
        s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 100 = 0),
           |scored AS (SELECT q.qid, e.vec_id AS id, $knnDist AS dist FROM embeddings e, q),
           |ranked AS (SELECT qid, id, dist,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS INT) AS "rank" FROM scored)
           |SELECT qid, "rank", id, dist FROM ranked WHERE "rank" <= 10""".stripMargin,

      // full-probe exact-probed search IS brute force: q03's oracle, with
      // the routed machinery (probe join, pruning, ghost dedup) under test
      "q122_routed_exact_full_probe" ->
        s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 100 = 0),
           |scored AS (SELECT q.qid, e.vec_id AS id, $knnDist AS dist FROM embeddings e, q),
           |ranked AS (SELECT qid, id, dist,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS INT) AS "rank" FROM scored)
           |SELECT qid, "rank", id, dist FROM ranked WHERE "rank" <= 10""".stripMargin,

      // the equi-join twin must hit the identical hash
      "q145_routed_exact_large" ->
        s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 100 = 0),
           |scored AS (SELECT q.qid, e.vec_id AS id, $knnDist AS dist FROM embeddings e, q),
           |ranked AS (SELECT qid, id, dist,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS INT) AS "rank" FROM scored)
           |SELECT qid, "rank", id, dist FROM ranked WHERE "rank" <= 10""".stripMargin,

      "q50_filtered_knn" ->
        s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 100 = 0),
           |scored AS (SELECT q.qid, e.vec_id AS id, $knnDist AS dist
           |  FROM embeddings e, q WHERE e.label % 3 = 0),
           |ranked AS (SELECT qid, id, dist,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS INT) AS "rank" FROM scored)
           |SELECT qid, "rank", id, dist FROM ranked WHERE "rank" <= 10""".stripMargin,

      "q04_order_limit" ->
        s"""SELECT e.vec_id AS id, ${l2Sql("e.embedding", "q.embedding", EmbDim)} AS dist
           |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
           |ORDER BY dist ASC, id ASC LIMIT 10""".stripMargin,

      "q05_rank_label_report" ->
        s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 100 = 0),
           |scored AS (SELECT q.qid, e.vec_id AS id, $knnDist AS dist FROM embeddings e, q),
           |ranked AS (SELECT qid, id, dist,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS INT) AS "rank" FROM scored)
           |SELECT r.qid, r."rank", r.id, r.dist,
           |  concat('class_', CAST(l.label AS VARCHAR)) AS label_name,
           |  CASE WHEN r.id = r.qid THEN '<- QUERY' ELSE '' END AS marker
           |FROM ranked r JOIN embeddings l ON l.vec_id = r.id WHERE r."rank" <= 5""".stripMargin,

      "q06_filter_valid" ->
        s"SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = $EmbDim",

      "q07_tombstone_filter" ->
        "SELECT vec_id FROM embeddings WHERE NOT (vec_id % 97 = 0)",

      "q08_entry_point" ->
        s"""SELECT vec_id, ${Levels.levelSql("vec_id", Levels.defaultML(16))} AS level
           |FROM embeddings ORDER BY level DESC, vec_id ASC LIMIT 1""".stripMargin,

      "q09_level_hist" ->
        s"""SELECT ${Levels.levelSql("vec_id", Levels.defaultML(16))} AS level, count(*) AS cnt
           |FROM embeddings GROUP BY 1""".stripMargin,

      "q10_dedup_exact" ->
        """SELECT doc_id,
          |  min(doc_id) OVER (PARTITION BY md5(lower(text))) AS canonical_id,
          |  doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_dup
          |FROM documents""".stripMargin,

      "q11_minhash_sig" ->
        s"""WITH ${shingleCte(3)}
           |SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |FROM shingles GROUP BY doc_id""".stripMargin,

      "q12_lsh_pairs" ->
        s"""WITH ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000)
           |SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.band
           |FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id""".stripMargin,

      "q36_dup_clusters" ->
        s"""WITH RECURSIVE ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach AS (
           |  SELECT doc_id AS id, doc_id AS comp FROM documents
           |  UNION
           |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON r.id = e.dst)
           |SELECT id AS doc_id, min(comp) AS comp FROM reach GROUP BY id""".stripMargin,

      "q41_full_pipeline" -> {
        val hv = md5PrefixValueSql("CAST(doc_id AS VARCHAR)", 8)
        s"""WITH ${shingleCte(3)},
           |sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
           |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
           |contaminated AS (SELECT sh.doc_id FROM sh JOIN bs ON sh.shingle = bs.shingle
           |  WHERE sh.doc_id % 50 <> 0 GROUP BY 1 HAVING count(*) >= 5),
           |kept AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id % 50 <> 0 AND $qualityExpr >= 0.55),
           |canon AS (SELECT doc_id, text FROM (SELECT doc_id, text,
           |  min(doc_id) OVER (PARTITION BY md5(lower(text))) AS cid FROM kept) WHERE doc_id = cid),
           |clean AS (SELECT c.doc_id, c.text FROM canon c
           |  LEFT JOIN contaminated x ON c.doc_id = x.doc_id WHERE x.doc_id IS NULL),
           |sampled AS (SELECT doc_id, ${langCase("text")} AS pred_lang FROM clean
           |  WHERE $hv % 100 < CASE ${langCase("text")}
           |    WHEN 'en' THEN 50 WHEN 'und' THEN 10 ELSE 20 END)
           |SELECT pred_lang, count(*) AS n_docs FROM sampled GROUP BY 1""".stripMargin
      },

      "q39_contamination" ->
        s"""WITH ${shingleCte(3)},
           |sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
           |bs AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
           |ts AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0)
           |SELECT ts.doc_id, count(*) AS n_shared
           |FROM ts JOIN bs ON ts.shingle = bs.shingle
           |GROUP BY 1 HAVING count(*) >= 5""".stripMargin,

      "q40_stratified_sample" -> {
        val hv = md5PrefixValueSql("CAST(doc_id AS VARCHAR)", 8)
        s"""SELECT doc_id, ${langCase("text")} AS pred_lang
           |FROM documents
           |WHERE $hv % 100 < CASE ${langCase("text")}
           |  WHEN 'en' THEN 50 WHEN 'und' THEN 10 ELSE 20 END""".stripMargin
      },

      "q42_repetition" ->
        s"""WITH ${shingleCte(3)},
           |per AS (SELECT doc_id, shingle, count(*) AS c FROM shingles GROUP BY 1, 2)
           |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_shingles, count(*) AS n_distinct,
           |  CAST(max(c) AS BIGINT) AS max_rep,
           |  1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_ratio
           |FROM per GROUP BY 1""".stripMargin,

      "q43_top_ngrams" ->
        s"""WITH ${shingleCte(3)},
           |st AS (SELECT shingle, count(DISTINCT doc_id) AS df, count(*) AS cf
           |  FROM shingles GROUP BY 1),
           |top AS (SELECT shingle, df, cf FROM st ORDER BY df DESC, cf DESC, shingle LIMIT 20)
           |SELECT row_number() OVER (ORDER BY df DESC, cf DESC, shingle) AS rank,
           |  shingle, df, cf FROM top""".stripMargin,

      "q44_pack_sequences" ->
        s"""WITH t AS (SELECT doc_id, ${tokenCountSql("text")} AS n_tok FROM documents),
           |c AS (SELECT doc_id, n_tok,
           |  CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS strt FROM t)
           |SELECT CAST(strt // 2048 AS BIGINT) AS seq_id, count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
           |  CAST(min(doc_id) AS BIGINT) AS first_doc, CAST(max(doc_id) AS BIGINT) AS last_doc
           |FROM c GROUP BY 1""".stripMargin,

      // the confusable table replayed literally (the q135 mojibake
      // pattern: the Scala table IS the oracle's source, one truth);
      // the spoof is planted via chr() codepoints — Cyrillic a/ie/dze
      "q147_confusable_dedup" -> {
        val chain = graft.functions.TextFunctions.ConfusablePairs
          .foldLeft("lower(text)") { case (e, (b, g)) => s"replace($e, '$b', '$g')" }
        s"""WITH p AS (SELECT doc_id,
           |  'offer ' || CAST(doc_id // 2 AS VARCHAR) ||
           |  (CASE WHEN doc_id % 2 = 0 THEN ' paypal secure'
           |        ELSE ' p' || chr(1072) || 'yp' || chr(1072) || 'l ' ||
           |          chr(1109) || chr(1077) || 'cur' || chr(1077) END) AS text
           |  FROM documents),
           |f AS (SELECT doc_id, $chain AS text FROM p)
           |SELECT doc_id,
           |  min(doc_id) OVER (PARTITION BY md5(lower(text))) AS canonical_id,
           |  doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_dup
           |FROM f""".stripMargin
      },

      // q10's dedup oracle over nfc_normalize'd planted text: the
      // decomposed/precomposed pair merge IS the normalization proof
      "q146_nfc_dedup" ->
        """WITH p AS (SELECT doc_id,
          |  'group ' || CAST(doc_id // 2 AS VARCHAR) ||
          |  (CASE WHEN doc_id % 2 = 0 THEN ' caf' || chr(233)
          |        ELSE ' cafe' || chr(769) END) AS text FROM documents),
          |n AS (SELECT doc_id, nfc_normalize(text) AS text FROM p)
          |SELECT doc_id,
          |  min(doc_id) OVER (PARTITION BY md5(lower(text))) AS canonical_id,
          |  doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_dup
          |FROM n""".stripMargin,

      // the LEB128 bytes re-derived with integer shifts (range/list_
      // transform/list_filter mirror sequence/transform/filter), hex via
      // to_hex (uppercase in both engines), stream order = doc_id order
      "q144_posting_bytes" ->
        """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          |p AS (SELECT DISTINCT tok, doc_id FROM t),
          |d AS (SELECT tok, count(*) AS df FROM p GROUP BY 1
          |      HAVING count(*) BETWEEN 50 AND 400),
          |g AS (SELECT p.tok, d.df, p.doc_id,
          |  p.doc_id - lag(p.doc_id, 1, -1) OVER (PARTITION BY p.tok ORDER BY p.doc_id) AS gap
          |  FROM p JOIN d USING (tok)),
          |vb AS (SELECT tok, df, doc_id,
          |  list_filter(list_transform(range(0, 10), i ->
          |    CASE WHEN i = 0 OR (gap >> (7*i)) > 0
          |         THEN CAST(((gap >> (7*i)) & 127)
          |              + (CASE WHEN (gap >> (7*(i+1))) > 0 THEN 128 ELSE 0 END) AS INT)
          |         ELSE -1 END), b -> b >= 0) AS v
          |  FROM g)
          |SELECT tok, CAST(df AS BIGINT) AS df,
          |  CAST(sum(len(v)) AS BIGINT) AS n_bytes,
          |  string_agg(list_aggregate(list_transform(v,
          |    b -> lpad(to_hex(b), 2, '0')), 'string_agg', ''), '' ORDER BY doc_id)
          |    AS postings_hex
          |FROM vb GROUP BY 1, 2""".stripMargin,

      // UAX #15 NFC in both engines (JDK Normalizer vs utf8proc);
      // chr() builds the decomposed plant (DuckDB chr is full-Unicode;
      // the Spark side uses \u escapes — Spark's chr is byte-valued)
      "q143_nfc_normalize" ->
        """WITH p AS (SELECT doc_id,
          |  text || ' Cafe' || chr(769) || ' nai' || chr(776) || 've ' ||
          |  chr(8491) || ' A' || chr(778) AS praw FROM documents)
          |SELECT doc_id, nfc_normalize(praw) AS text_nfc,
          |  CAST(length(praw) AS BIGINT) AS len_raw,
          |  CAST(length(nfc_normalize(praw)) AS BIGINT) AS len_nfc FROM p""".stripMargin,

      // blocklist contexts: positions via generate_series, snippet via
      // inclusive list slicing clamped at both boundaries
      "q142_blocklist_context" ->
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |p AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM t),
          |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, w[pos] AS term, w
          |  FROM p WHERE w[pos] IN ('slow', 'merge'))
          |SELECT doc_id, pos, term,
          |  array_to_string(w[greatest(pos - 3, 1):least(pos + 3, len(w))], ' ') AS snippet
          |FROM h""".stripMargin,

      // KMV containment: identical k-smallest-distinct sketches (md5
      // prefix hashes), the union-k window per pair over <= 2k rows,
      // integer counts, one exact division
      "q141_kmv_containment" -> {
        val b = md5PrefixValueSql("shingle", 8)
        s"""WITH ${shingleCteFrom(3, "documents", "ks")},
           |dh AS (SELECT DISTINCT d.source AS g, ($b) % 4294967296 AS h
           |  FROM ks JOIN documents d USING (doc_id)),
           |rk AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
           |  FROM dh),
           |sk AS (SELECT g, CAST(h AS BIGINT) AS h FROM rk WHERE r <= 64),
           |srcs AS (SELECT DISTINCT g FROM sk),
           |pairs AS (SELECT s1.g AS a, s2.g AS b FROM srcs s1, srcs s2
           |  WHERE s1.g <> s2.g),
           |u AS (
           |  SELECT p.a, p.b, s.h, max(CASE WHEN s.g = p.a THEN 1 ELSE 0 END) AS in_a,
           |    max(CASE WHEN s.g = p.b THEN 1 ELSE 0 END) AS in_b
           |  FROM pairs p JOIN sk s ON s.g = p.a OR s.g = p.b
           |  GROUP BY 1, 2, 3),
           |topu AS (SELECT a, b, in_a, in_b,
           |    row_number() OVER (PARTITION BY a, b ORDER BY h) AS r FROM u),
           |agg AS (SELECT a, b, CAST(sum(in_a) AS BIGINT) AS x_a,
           |    CAST(sum(in_a * in_b) AS BIGINT) AS x_ab
           |  FROM topu WHERE r <= 64 GROUP BY 1, 2)
           |SELECT a, b, x_a, x_ab,
           |  CASE WHEN x_a = 0 THEN 0.0
           |       ELSE CAST(x_ab AS DOUBLE) / CAST(x_a AS DOUBLE) END AS containment
           |FROM agg""".stripMargin
      },

      "q140_pack_boundaries" ->
        s"""WITH t AS (SELECT doc_id, ${tokenCountSql("text")} AS n_tok FROM documents),
           |c AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           |  CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS strt FROM t)
           |SELECT doc_id AS id, CAST(strt // 2048 AS BIGINT) AS seq_id,
           |  CAST(strt - (strt // 2048) * 2048 AS BIGINT) AS seq_off, n_tok,
           |  CAST((strt - (strt // 2048) * 2048) + n_tok > 2048 AS INT) AS overrun
           |FROM c""".stripMargin,

      "q45_vocab_coverage" ->
        s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
           |c AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
           |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
           |top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 50)
           |SELECT row_number() OVER (ORDER BY cnt DESC, word) AS rank, word, cnt,
           |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           |    / CAST(total AS DOUBLE) AS cum_share
           |FROM top, t""".stripMargin,

      "q46_pii_redact" -> {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
        val ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
        s"""WITH s AS (SELECT doc_id, concat(text, ' contact: ',
           |    string_split(text, ' ')[1], '@', string_split(text, ' ')[2], '.com tel: 555-',
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
           |    ' ip: 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1') AS text
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
           |  CAST(len(regexp_extract_all(text, '$ipv4Re')) AS BIGINT) AS n_ipv4,
           |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
           |    '$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g'),
           |    '$ipv4Re', '<IP>', 'g')) AS BIGINT) AS redacted_len
           |FROM s""".stripMargin
      },

      "q47_gopher_rules" -> {
        val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |a AS (SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(len(tok)) AS BIGINT) AS sum_len,
           |  CAST(max(len(tok)) AS BIGINT) AS max_word_len,
           |  count(DISTINCT tok) AS n_distinct,
           |  CAST(sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
           |  FROM w GROUP BY 1),
           |b AS (SELECT doc_id, n_words, n_stop, max_word_len,
           |  CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
           |  1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_ratio
           |  FROM a)
           |SELECT doc_id, n_words, mean_word_len, n_stop, dup_word_ratio, max_word_len,
           |  n_words >= 30 AND n_words <= 100000 AS word_count_ok,
           |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS mean_len_ok,
           |  n_stop >= 2 AS stop_ok,
           |  dup_word_ratio <= 0.55 AS dup_ok,
           |  max_word_len <= 15 AS word_len_ok,
           |  (n_words >= 30 AND n_words <= 100000)
           |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
           |    AND n_stop >= 2 AND dup_word_ratio <= 0.55 AND max_word_len <= 15 AS keep
           |FROM b""".stripMargin
      },

      // q47's per-doc rule booleans, pivoted long and aggregated — the
      // exclusive count keys on exactly one failed rule per doc
      "q112_rule_attribution" -> {
        val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |a AS (SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(len(tok)) AS BIGINT) AS sum_len,
           |  CAST(max(len(tok)) AS BIGINT) AS max_word_len,
           |  count(DISTINCT tok) AS n_distinct,
           |  CAST(sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
           |  FROM w GROUP BY 1),
           |b AS (SELECT doc_id, n_words, n_stop, max_word_len,
           |  CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
           |  1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_ratio
           |  FROM a),
           |oks AS (SELECT doc_id,
           |  n_words >= 30 AND n_words <= 100000 AS word_count_ok,
           |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS mean_len_ok,
           |  n_stop >= 2 AS stop_ok,
           |  dup_word_ratio <= 0.55 AS dup_ok,
           |  max_word_len <= 15 AS word_len_ok
           |  FROM b),
           |nf AS (SELECT doc_id, word_count_ok, mean_len_ok, stop_ok, dup_ok, word_len_ok,
           |  (CASE WHEN word_count_ok THEN 0 ELSE 1 END) + (CASE WHEN mean_len_ok THEN 0 ELSE 1 END)
           |  + (CASE WHEN stop_ok THEN 0 ELSE 1 END) + (CASE WHEN dup_ok THEN 0 ELSE 1 END)
           |  + (CASE WHEN word_len_ok THEN 0 ELSE 1 END) AS n_failed
           |  FROM oks),
           |longf AS (
           |  SELECT 'word_count_ok' AS rule, word_count_ok AS ok, n_failed FROM nf
           |  UNION ALL SELECT 'mean_len_ok', mean_len_ok, n_failed FROM nf
           |  UNION ALL SELECT 'stop_ok', stop_ok, n_failed FROM nf
           |  UNION ALL SELECT 'dup_ok', dup_ok, n_failed FROM nf
           |  UNION ALL SELECT 'word_len_ok', word_len_ok, n_failed FROM nf)
           |SELECT rule,
           |  CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
           |  CAST(sum(CASE WHEN NOT ok AND n_failed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive
           |FROM longf GROUP BY 1""".stripMargin
      },

      "q48_incremental_dedup" ->
        s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 2),
           |newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 2
           |  UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM documents
           |    WHERE doc_id % 10 >= 2 AND doc_id % 50 = 7),
           |${shingleCteFrom(3, "corp", "csh_raw")},
           |${shingleCteFrom(3, "newd", "nsh_raw")},
           |csd AS (SELECT DISTINCT doc_id, shingle FROM csh_raw),
           |cdf AS (SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM csd),
           |csh AS (SELECT doc_id, shingle FROM cdf WHERE df <= 5),
           |hot AS (SELECT DISTINCT shingle FROM cdf WHERE df > 5),
           |nsd AS (SELECT DISTINCT doc_id, shingle FROM nsh_raw),
           |nsh AS (SELECT doc_id, shingle FROM nsd WHERE shingle NOT IN (SELECT shingle FROM hot)),
           |na AS (SELECT doc_id, count(*) AS n_a FROM nsh GROUP BY 1),
           |nb AS (SELECT doc_id, count(*) AS n_b FROM csh GROUP BY 1),
           |inter AS (SELECT a.doc_id AS id_new, b.doc_id AS id_corp, count(*) AS n_inter
           |  FROM nsh a JOIN csh b ON a.shingle = b.shingle GROUP BY 1, 2),
           |jac AS (SELECT id_new,
           |    CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS j
           |  FROM inter JOIN na ON na.doc_id = inter.id_new JOIN nb ON nb.doc_id = inter.id_corp),
           |near AS (SELECT id_new, count(*) AS n_near, max(j) AS bj
           |  FROM jac WHERE j >= 0.2 GROUP BY 1),
           |ex AS (SELECT DISTINCT n.doc_id FROM newd n
           |  JOIN corp c ON md5(lower(n.text)) = md5(lower(c.text)))
           |SELECT nd.doc_id,
           |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
           |       WHEN near.id_new IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status,
           |  COALESCE(near.n_near, 0) AS n_near_matches,
           |  COALESCE(near.bj, 0.0) AS best_jaccard
           |FROM newd nd LEFT JOIN ex ON ex.doc_id = nd.doc_id
           |  LEFT JOIN near ON near.id_new = nd.doc_id""".stripMargin,

      // duplicated = any second occurrence of the 8-shingle corpus-wide
      // (across docs or within one); islands via pos - row_number per doc;
      // span_end = last duplicated shingle start + 7 (integer arithmetic
      // throughout — bit-exact by construction)
      "q71_dup_spans" ->
        s"""WITH ${posShingleCteFrom(8, "documents", "psh")},
           |dup AS (SELECT shingle FROM psh GROUP BY shingle HAVING count(*) >= 2),
           |mk AS (SELECT p.doc_id, p.pos FROM psh p JOIN dup USING (shingle)),
           |isl AS (SELECT doc_id, pos,
           |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |  FROM mk),
           |sp AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
           |    count(*) AS n_shingles
           |  FROM isl GROUP BY doc_id, island)
           |SELECT doc_id, span_start, span_end, n_shingles
           |FROM sp WHERE n_shingles >= 2""".stripMargin,

      "q72_span_coverage" ->
        s"""WITH ${posShingleCteFrom(8, "documents", "psh")},
           |dup AS (SELECT shingle FROM psh GROUP BY shingle HAVING count(*) >= 2),
           |mk AS (SELECT p.doc_id, p.pos FROM psh p JOIN dup USING (shingle)),
           |cov AS (SELECT doc_id, count(DISTINCT tok) AS dup_tokens FROM (
           |    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS tok FROM mk)
           |  GROUP BY doc_id),
           |nt AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
           |SELECT nt.doc_id, nt.n_tokens, COALESCE(cov.dup_tokens, 0) AS dup_tokens
           |FROM nt LEFT JOIN cov USING (doc_id)""".stripMargin,

      "q73_span_scrub" ->
        s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 2),
           |newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 2),
           |${posShingleCteFrom(8, "newd", "nps")},
           |${shingleCteFrom(8, "corp", "csh_raw")},
           |csh AS (SELECT DISTINCT shingle FROM csh_raw),
           |mk AS (SELECT p.doc_id, p.pos FROM nps p JOIN csh USING (shingle)),
           |cov AS (SELECT DISTINCT doc_id, tok_idx FROM (
           |    SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS tok_idx FROM mk)),
           |ntk AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS tok_idx
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM newd)),
           |kept AS (SELECT t.doc_id, t.tok_idx, t.w[t.tok_idx] AS tok
           |  FROM ntk t LEFT JOIN cov c
           |    ON t.doc_id = c.doc_id AND t.tok_idx = c.tok_idx
           |  WHERE c.doc_id IS NULL),
           |rb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tok_idx) AS text_scrubbed,
           |    count(*) AS kept_tokens
           |  FROM kept GROUP BY doc_id),
           |nt AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM newd)
           |SELECT nt.doc_id, COALESCE(rb.text_scrubbed, '') AS text_scrubbed,
           |  nt.n_tokens, COALESCE(rb.kept_tokens, 0) AS kept_tokens
           |FROM nt LEFT JOIN rb USING (doc_id)""".stripMargin,

      "q54_adaptive_quality" ->
        s"""WITH s AS (SELECT doc_id, lang, $qualityExpr AS quality FROM documents
           |  WHERE ${tokenCountSql("text")} >= 1),
           |d AS (SELECT lang, quality, count(*) AS c FROM s GROUP BY 1, 2),
           |cum AS (SELECT lang, quality,
           |    COALESCE(sum(c) OVER (PARTITION BY lang ORDER BY quality
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
           |    sum(c) OVER (PARTITION BY lang) AS n
           |  FROM d),
           |p AS (SELECT lang, quality,
           |    CASE WHEN n = 1 THEN 0.0
           |         ELSE CAST(below AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS q_pct
           |  FROM cum)
           |SELECT s.doc_id, s.lang, s.quality, p.q_pct, p.q_pct >= 0.5 AS kept
           |FROM s JOIN p ON s.lang = p.lang AND s.quality = p.quality""".stripMargin,

      "q55_canonical_docs" ->
        s"""WITH RECURSIVE ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach AS (
           |  SELECT doc_id AS id, doc_id AS comp FROM documents
           |  UNION
           |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON r.id = e.dst),
           |comps AS (SELECT id AS doc_id, min(comp) AS comp FROM reach GROUP BY id),
           |scored AS (SELECT c.doc_id, c.comp, $qualityExpr AS score
           |  FROM comps c JOIN documents USING (doc_id)
           |  WHERE ${tokenCountSql("text")} >= 1),
           |best AS (SELECT comp, max(score) AS best_score FROM scored GROUP BY 1),
           |canon AS (SELECT s.comp, min(s.doc_id) AS canonical_id
           |  FROM scored s JOIN best b ON s.comp = b.comp AND s.score = b.best_score
           |  GROUP BY 1)
           |SELECT s.doc_id, s.comp, c.canonical_id, s.doc_id = c.canonical_id AS keep
           |FROM scored s JOIN canon c ON s.comp = c.comp""".stripMargin,

      "q56_leakage_split" ->
        s"""WITH RECURSIVE ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach AS (
           |  SELECT doc_id AS id, doc_id AS comp FROM documents
           |  UNION
           |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON r.id = e.dst),
           |comps AS (SELECT id AS doc_id, min(comp) AS comp FROM reach GROUP BY id)
           |SELECT doc_id, comp,
           |  CASE WHEN ${md5PrefixValueSql("CAST(comp AS VARCHAR)", 8)} % 100 < 10
           |       THEN 'valid' ELSE 'train' END AS split
           |FROM comps""".stripMargin,

      "q57_bigram_lm" ->
        s"""WITH ${shingleCte(2)},
           |pc AS (SELECT shingle AS bigram, count(*) AS n_pair FROM shingles GROUP BY 1),
           |pw AS (SELECT bigram, string_split(bigram, ' ')[1] AS w1, n_pair FROM pc),
           |fc AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_first FROM pw GROUP BY 1)
           |SELECT bigram, pw.w1, n_pair, n_first,
           |  CAST(n_pair AS DOUBLE) / CAST(n_first AS DOUBLE) AS cond_p
           |FROM pw JOIN fc ON pw.w1 = fc.w1
           |ORDER BY n_pair DESC, bigram LIMIT 20""".stripMargin,

      "q58_hashed_bow" ->
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
           |SELECT doc_id, ${md5PrefixValueSql("tok", 8)} % 64 AS bucket, count(*) AS tf
           |FROM toks GROUP BY 1, 2""".stripMargin,

      "q59_bow_topk" ->
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |bow AS (SELECT doc_id, ${md5PrefixValueSql("tok", 8)} % 64 AS bucket, count(*) AS tf
           |  FROM toks GROUP BY 1, 2),
           |q AS (SELECT bucket, tf AS qtf FROM bow WHERE doc_id = 42),
           |dt AS (SELECT b.doc_id, CAST(sum(b.tf * q.qtf) AS BIGINT) AS dot
           |  FROM bow b JOIN q USING (bucket) GROUP BY 1),
           |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM bow GROUP BY 1),
           |qn AS (SELECT n2 AS qn2 FROM norms WHERE doc_id = 42)
           |SELECT d.doc_id,
           |  CAST(d.dot AS DOUBLE) / sqrt(CAST(n.n2 AS DOUBLE) * CAST(qn.qn2 AS DOUBLE)) AS cos_sim
           |FROM dt d JOIN norms n USING (doc_id), qn
           |ORDER BY cos_sim DESC, d.doc_id LIMIT 10""".stripMargin,

      "q60_lsh_verified" ->
        s"""WITH ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |sd AS (SELECT DISTINCT doc_id, shingle FROM shingles),
           |sz AS (SELECT doc_id, count(*) AS n_sh FROM sd GROUP BY 1),
           |it AS (SELECT p.id_a, p.id_b, count(*) AS n_inter
           |  FROM prs p
           |  JOIN sd a ON a.doc_id = p.id_a
           |  JOIN sd b ON b.doc_id = p.id_b AND b.shingle = a.shingle
           |  GROUP BY 1, 2)
           |SELECT p.id_a, p.id_b, COALESCE(it.n_inter, 0) AS n_inter,
           |  CASE WHEN COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) = 0
           |       THEN 0.0
           |       ELSE CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
           |            CAST(COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) AS DOUBLE)
           |  END AS jaccard,
           |  (CASE WHEN COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) = 0
           |        THEN 0.0
           |        ELSE CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
           |             CAST(COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) AS DOUBLE)
           |   END) >= 0.4 AS is_dup
           |FROM prs p
           |LEFT JOIN it ON it.id_a = p.id_a AND it.id_b = p.id_b
           |LEFT JOIN sz sa ON sa.doc_id = p.id_a
           |LEFT JOIN sz sb ON sb.doc_id = p.id_b""".stripMargin,

      // q14's language expression + q28's BPE count, aggregated
      "q114_tokenizer_fertility" ->
        s"""WITH d AS (SELECT doc_id, ${langCase("text")} AS pred_lang,
           |    CAST(${tokenCountSql("text")} AS BIGINT) AS n_words,
           |    CAST(len(regexp_extract_all(lower(text), '${TextFunctions.BpePattern}')) AS BIGINT) AS n_bpe
           |  FROM documents)
           |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_words) AS BIGINT) AS words, CAST(sum(n_bpe) AS BIGINT) AS bpe,
           |  CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility
           |FROM d GROUP BY 1""".stripMargin,

      // same derived snapshot B, md5-fingerprint comparison, full-outer
      "q113_snapshot_diff" ->
        s"""WITH a AS (SELECT doc_id, md5(lower(text)) AS fp_a FROM documents),
           |b0 AS (SELECT doc_id,
           |    CASE WHEN doc_id % 13 = 0 THEN 'recrawl ' || text ELSE text END AS text
           |  FROM documents WHERE doc_id % 17 <> 0
           |  UNION ALL SELECT 0 - doc_id - 1 AS doc_id, text FROM documents WHERE doc_id % 19 = 0),
           |b AS (SELECT doc_id, md5(lower(text)) AS fp_b FROM b0)
           |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           |  CASE WHEN a.fp_a IS NULL THEN 'added'
           |       WHEN b.fp_b IS NULL THEN 'removed'
           |       WHEN a.fp_a = b.fp_b THEN 'unchanged'
           |       ELSE 'changed' END AS status,
           |  CAST(a.fp_a IS NOT NULL AS INT) AS in_a,
           |  CAST(b.fp_b IS NOT NULL AS INT) AS in_b
           |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin,

      // the oracle uses the per-anchor window the engine's heap replaces;
      // order (pair hash, cand) mirrors the heap's (dist asc, id asc)
      "q111_inbatch_negatives" ->
        s"""WITH items AS (SELECT vec_id AS id, label,
           |    ${md5PrefixValueSql("CAST(vec_id AS VARCHAR)", 15)} % 256 AS batch
           |  FROM embeddings),
           |p AS (SELECT a.id AS anchor, b.id AS cand,
           |    ${md5PrefixValueSql("CAST(a.id AS VARCHAR) || '|' || CAST(b.id AS VARCHAR)", 12)} AS h
           |  FROM items a JOIN items b
           |    ON a.batch = b.batch AND a.id <> b.id AND a.label <> b.label),
           |r AS (SELECT anchor, cand, row_number() OVER (PARTITION BY anchor ORDER BY h, cand) AS rn FROM p)
           |SELECT anchor, CAST(rn AS INT) AS "rank", cand AS neg_id FROM r WHERE rn <= 3""".stripMargin,

      // same wrap + same regex chain (Java/RE2-common subset), DuckDB
      // needs the 'g' flag Spark applies by default
      "q110_html_strip" ->
        s"""WITH h AS (SELECT doc_id,
           |  '<html><head><title>t&amp;x</title><script type="x">var a = ''<p>junk</p>'';</script></head><body><p>'
           |  || text ||
           |  '</p><div class="foot">&lt;footer&gt;&nbsp;text</div></body></html>' AS html
           |  FROM documents),
           |s1 AS (SELECT doc_id, regexp_replace(html, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h),
           |s2 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s1),
           |s3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
           |  '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t FROM s2),
           |c AS (SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean_text FROM s3)
           |SELECT doc_id, clean_text, CAST(${tokenCountSql("clean_text")} AS BIGINT) AS n_tok FROM c""".stripMargin,

      // closed-form WARC re-derivation: the payload string is rebuilt
      // from the arithmetic (list_transform lambda), so content_length
      // and token counts — including record 0's embedded "WARC/1.0"
      // trap token — come from SQL alone
      "q108_warc_records" ->
        s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 7 = 0),
           |recs AS (SELECT id, unnest(generate_series(0, CAST(id % 3 AS INT))) AS rec FROM ids),
           |base AS (SELECT id, CAST(rec AS BIGINT) AS rec,
           |    CAST(20 + (id + rec) % 10 AS BIGINT) AS n FROM recs),
           |pl AS (SELECT id, rec, n,
           |    array_to_string(list_transform(generate_series(0, CAST(n - 1 AS INT)),
           |      j -> 'w' || CAST((id * 13 + rec * 3 + j) % 50 AS VARCHAR)), ' ')
           |    || CASE WHEN rec = 0 THEN ' WARC/1.0' ELSE '' END AS payload
           |  FROM base)
           |SELECT id, rec,
           |  'h' || CAST((id * 7 + rec) % 5 AS VARCHAR) || '.example' AS host,
           |  CAST(length(payload) AS BIGINT) AS content_length,
           |  n + CASE WHEN rec = 0 THEN 1 ELSE 0 END AS n_tok
           |FROM pl""".stripMargin,

      // q108's closed-form payload CTEs, rolled up by host
      "q115_host_stats" ->
        s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 7 = 0),
           |recs AS (SELECT id, unnest(generate_series(0, CAST(id % 3 AS INT))) AS rec FROM ids),
           |base AS (SELECT id, CAST(rec AS BIGINT) AS rec,
           |    CAST(20 + (id + rec) % 10 AS BIGINT) AS n FROM recs),
           |pl AS (SELECT id, rec, n,
           |    array_to_string(list_transform(generate_series(0, CAST(n - 1 AS INT)),
           |      j -> 'w' || CAST((id * 13 + rec * 3 + j) % 50 AS VARCHAR)), ' ')
           |    || CASE WHEN rec = 0 THEN ' WARC/1.0' ELSE '' END AS payload
           |  FROM base)
           |SELECT 'h' || CAST((id * 7 + rec) % 5 AS VARCHAR) || '.example' AS host,
           |  CAST(count(*) AS BIGINT) AS n_pages,
           |  CAST(sum(length(payload)) AS BIGINT) AS payload_bytes,
           |  CAST(sum(n + CASE WHEN rec = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tokens
           |FROM pl GROUP BY 1""".stripMargin,

      // URL canonical = min packed (id*8 + rec) per closed-form URL
      "q109_url_dedup" ->
        s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 7 = 0),
           |recs0 AS (SELECT id, unnest(generate_series(0, CAST(id % 3 AS INT))) AS rec FROM ids),
           |recs AS (SELECT id, CAST(rec AS BIGINT) AS rec,
           |    'http://h' || CAST((id * 7 + rec) % 5 AS VARCHAR) ||
           |    '.example/p' || CAST((id * 13 + rec) % 7 AS VARCHAR) AS url,
           |    id * 8 + rec AS pk
           |  FROM recs0),
           |c AS (SELECT url, min(pk) AS pk_min FROM recs GROUP BY 1)
           |SELECT r.id, r.rec, r.url, CAST(r.pk <> c.pk_min AS INT) AS is_dup
           |FROM recs r JOIN c USING (url)""".stripMargin,

      // winnowing: the packed h*2^20 + (2^20 - pos) trick makes the
      // window min the rightmost-minimum rule as one integer compare
      "q106_winnowing" ->
        s"""WITH ${posShingleCteFrom(5, "documents", "psh")},
           |hashed AS (SELECT doc_id, pos,
           |    ${md5PrefixValueSql("shingle", 10)} AS h
           |  FROM psh),
           |packed AS (SELECT doc_id, pos, h,
           |    h * 1048576 + (1048576 - pos) AS c
           |  FROM hashed),
           |winmin AS (SELECT doc_id, pos,
           |    min(c) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cmin,
           |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS nw
           |  FROM packed)
           |SELECT DISTINCT doc_id,
           |  1048576 - (cmin % 1048576) AS pos,
           |  cmin // 1048576 AS h
           |FROM winmin WHERE nw = 4""".stripMargin,

      // q106's sketch CTEs + distinct-hash self-join
      "q107_winnow_pairs" ->
        s"""WITH ${posShingleCteFrom(5, "documents", "psh")},
           |hashed AS (SELECT doc_id, pos,
           |    ${md5PrefixValueSql("shingle", 10)} AS h
           |  FROM psh),
           |packed AS (SELECT doc_id, pos, h,
           |    h * 1048576 + (1048576 - pos) AS c
           |  FROM hashed),
           |winmin AS (SELECT doc_id, pos,
           |    min(c) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cmin,
           |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS nw
           |  FROM packed),
           |fp AS (SELECT DISTINCT doc_id, cmin // 1048576 AS h
           |  FROM winmin WHERE nw = 4)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
           |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

      // q60's candidate CTEs, containment = n_inter / min(n_a, n_b)
      "q105_containment" ->
        s"""WITH ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |sd AS (SELECT DISTINCT doc_id, shingle FROM shingles),
           |sz AS (SELECT doc_id, count(*) AS n_sh FROM sd GROUP BY 1),
           |it AS (SELECT p.id_a, p.id_b, count(*) AS n_inter
           |  FROM prs p
           |  JOIN sd a ON a.doc_id = p.id_a
           |  JOIN sd b ON b.doc_id = p.id_b AND b.shingle = a.shingle
           |  GROUP BY 1, 2)
           |SELECT p.id_a, p.id_b, COALESCE(it.n_inter, 0) AS n_inter,
           |  COALESCE(sa.n_sh, 0) AS n_a, COALESCE(sb.n_sh, 0) AS n_b,
           |  CASE WHEN least(COALESCE(sa.n_sh, 0), COALESCE(sb.n_sh, 0)) = 0 THEN 0.0
           |       ELSE CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
           |            CAST(least(COALESCE(sa.n_sh, 0), COALESCE(sb.n_sh, 0)) AS DOUBLE)
           |  END AS containment,
           |  CAST((CASE WHEN least(COALESCE(sa.n_sh, 0), COALESCE(sb.n_sh, 0)) = 0 THEN 0.0
           |        ELSE CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
           |             CAST(least(COALESCE(sa.n_sh, 0), COALESCE(sb.n_sh, 0)) AS DOUBLE)
           |   END) >= 0.9 AS INT) AS is_contained
           |FROM prs p
           |LEFT JOIN it ON it.id_a = p.id_a AND it.id_b = p.id_b
           |LEFT JOIN sz sa ON sa.doc_id = p.id_a
           |LEFT JOIN sz sb ON sb.doc_id = p.id_b""".stripMargin,

      "q62_bow_topk_batch" ->
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |bow AS (SELECT doc_id, ${md5PrefixValueSql("tok", 8)} % 64 AS bucket, count(*) AS tf
           |  FROM toks GROUP BY 1, 2),
           |q AS (SELECT doc_id AS qid, bucket, tf AS qtf FROM bow WHERE doc_id IN (7, 42)),
           |dt AS (SELECT q.qid, b.doc_id, CAST(sum(b.tf * q.qtf) AS BIGINT) AS dot
           |  FROM bow b JOIN q USING (bucket) GROUP BY 1, 2),
           |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM bow GROUP BY 1),
           |qn AS (SELECT doc_id AS qid, n2 AS qn2 FROM norms WHERE doc_id IN (7, 42)),
           |scored AS (SELECT dt.qid, dt.doc_id,
           |    1.0 - CAST(dt.dot AS DOUBLE) / sqrt(CAST(n.n2 AS DOUBLE) * CAST(qn.qn2 AS DOUBLE)) AS dist
           |  FROM dt JOIN norms n ON n.doc_id = dt.doc_id JOIN qn ON qn.qid = dt.qid)
           |SELECT qid, rank, doc_id, dist FROM (
           |  SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, doc_id) AS INT) AS rank,
           |         doc_id, dist
           |  FROM scored) WHERE rank <= 10""".stripMargin,

      "q63_zorder" ->
        s"""SELECT l_orderkey, l_linenumber,
           |  ${graft.sources.Bucketing.zValueSql("l_partkey", "l_suppkey")} AS zval
           |FROM lineitem""".stripMargin,

      "q68_domain_score" -> {
        val b = md5PrefixValueSql("shingle", 8)
        s"""WITH ${shingleCteFrom(2, "documents", "ds")},
           |${shingleCteFrom(2, "(SELECT * FROM documents WHERE lang = 'en')", "ts")},
           |db AS (SELECT DISTINCT doc_id, ($b) % 65536 AS b FROM ds),
           |tb AS (SELECT DISTINCT ($b) % 65536 AS b FROM ts),
           |cnt AS (
           |  SELECT db.doc_id, count(*) AS n_buckets, count(tb.b) AS n_target
           |  FROM db LEFT JOIN tb ON db.b = tb.b GROUP BY db.doc_id)
           |SELECT d.doc_id,
           |  COALESCE(n_buckets, 0) AS n_buckets,
           |  COALESCE(n_target, 0) AS n_target,
           |  CASE WHEN COALESCE(n_buckets, 0) = 0 THEN 0.0
           |       ELSE CAST(COALESCE(n_target, 0) AS DOUBLE) / CAST(n_buckets AS DOUBLE)
           |  END AS domain_score
           |FROM (SELECT DISTINCT doc_id FROM documents) d
           |LEFT JOIN cnt ON d.doc_id = cnt.doc_id""".stripMargin
      },

      // the decoded-record label + pixel-byte sums re-derived from the
      // record formula alone (same scalar generate_series + unnest shape
      // as q67; the gzip/raw split is invisible here by design — lossless
      // codecs decode to the same bytes)
      "q70_cifar_decode" ->
        """WITH files AS (
          |  SELECT doc_id AS id, 2 + doc_id % 3 AS recs
          |  FROM documents WHERE doc_id % 11 = 0),
          |r AS (
          |  SELECT id, unnest(generate_series(0, recs - 1)) AS rec FROM files),
          |px AS (
          |  SELECT id, rec, unnest(generate_series(0, 3071)) AS j FROM r)
          |SELECT id, CAST(rec AS BIGINT) AS rec,
          |  CAST((id + rec) % 10 AS INT) AS label,
          |  CAST(SUM((id * 31 + rec * 17 + 3 * j * j) % 256) AS BIGINT) AS px_sum,
          |  CAST(SUM((j % 101) * ((id * 31 + rec * 17 + 3 * j * j) % 256)) AS BIGINT)
          |    AS px_wsum
          |FROM px GROUP BY id, rec""".stripMargin,

      // the decoded-sample sums re-derived from the sample formula alone
      // (same scalar generate_series + unnest shape as q67)
      // decoded-luma sums re-derived from the luma formula alone; flat
      // index q over frames x pixels: f = q // (w*h), x = (q % (w*h)) % w,
      // y = (q % (w*h)) // w (q67's trick with one more dimension)
      // q48's dedup CTEs gated first (q116's gate CTEs over the ingest
      // batch): rejected docs never reach the dedup joins, every row
      // keeps its (n_tok, bin) budget columns
      "q119_prepare_verdicts" -> q119Sql,

      // q119's verdict query as a CTE, then the quota arithmetic: admitted
      // docs grouped to (source, bin) token masses, a bin-descending
      // running sum per source, keep = the bin STARTS under quota
      // (cum − bin_tok < quota) — bit-identical to budgetFromVerdicts'
      // window. Internal sums never surface (DuckDB SUM(BIGINT) widens to
      // HUGEINT; only compared, never projected).
      "q120_budget_from_verdicts" ->
        s"""WITH verd AS ($q119Sql),
           |admitted AS (SELECT * FROM verd WHERE status = 'new'),
           |bins AS (SELECT source, bin, SUM(n_tok) AS bin_tok
           |  FROM admitted GROUP BY 1, 2),
           |cum AS (SELECT source, bin, bin_tok,
           |  SUM(bin_tok) OVER (PARTITION BY source ORDER BY bin DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
           |  FROM bins),
           |keepb AS (SELECT source, bin,
           |  CASE WHEN cum_tok - bin_tok < $Q120Quota THEN 1 ELSE 0 END AS keep
           |  FROM cum)
           |SELECT a.doc_id, a.source, a.n_tok, a.bin, CAST(k.keep AS INT) AS keep
           |FROM admitted a JOIN keepb k ON a.source = k.source AND a.bin = k.bin""".stripMargin,

      // epoch upsampling: whole epochs = least(cap, target DIV t) exact
      // integer division, fractional remainder filled by the id-hash bin
      // prefix (cum − bin_tok < rem). generate_series(1, 0) is empty, so
      // the whole-epoch branch self-guards; the HUGEINT window sum is
      // compared, never projected.
      "q123_epoch_upsample" -> {
        val hv = md5PrefixValueSql("CAST(doc_id AS VARCHAR)", 8)
        s"""WITH toks AS (SELECT doc_id, source,
           |  CAST(${tokenCountSql("text")} AS BIGINT) AS n_tok,
           |  ($hv % 1000) AS bin FROM documents),
           |quotas AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS t
           |  FROM toks GROUP BY 1 HAVING sum(n_tok) > 0),
           |q2 AS (SELECT source, t,
           |  least(CAST(2 AS BIGINT), CAST(2600 AS BIGINT) // t) AS efull FROM quotas),
           |q3 AS (SELECT source, t, efull,
           |  CASE WHEN efull < 2 THEN CAST(2600 AS BIGINT) - efull * t
           |       ELSE CAST(0 AS BIGINT) END AS rem FROM q2),
           |fb AS (SELECT source, bin, CAST(sum(n_tok) AS BIGINT) AS bin_tok,
           |  SUM(sum(n_tok)) OVER (PARTITION BY source ORDER BY bin ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
           |  FROM toks GROUP BY 1, 2),
           |whole AS (SELECT tk.doc_id, tk.source, tk.n_tok,
           |  unnest(generate_series(CAST(1 AS BIGINT), q.efull)) AS epoch
           |  FROM toks tk JOIN q3 q USING (source) WHERE q.efull >= 1),
           |frac AS (SELECT tk.doc_id, tk.source, tk.n_tok,
           |  CAST(q.efull + 1 AS BIGINT) AS epoch
           |  FROM toks tk JOIN q3 q USING (source)
           |  JOIN fb ON fb.source = tk.source AND fb.bin = tk.bin
           |  WHERE q.rem > 0 AND fb.cum_tok - fb.bin_tok < q.rem)
           |SELECT doc_id, source, n_tok, epoch FROM whole
           |UNION ALL SELECT doc_id, source, n_tok, epoch FROM frac""".stripMargin
      },

      // fixed-point centroid distance: floor((x+1)·10⁶) per component
      // (nonnegative, so DuckDB's floor-// and Spark's trunc-DIV agree),
      // integer mean per dimension, integer sum of squared diffs
      "q124_embedding_outliers" ->
        """WITH fp AS (SELECT vec_id, list_transform(embedding,
          |  x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * 1000000) AS BIGINT)) AS f
          |  FROM embeddings),
          |ex AS (SELECT vec_id, unnest(f) AS v, generate_subscripts(f, 1) AS pos FROM fp),
          |m AS (SELECT pos, CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
          |  FROM ex GROUP BY 1),
          |d AS (SELECT e.vec_id, CAST(sum((e.v - m.m) * (e.v - m.m)) AS BIGINT) AS d2_fp
          |  FROM ex e JOIN m USING (pos) GROUP BY 1)
          |SELECT vec_id, d2_fp,
          |  CAST(CASE WHEN d2_fp > 1020000000000 THEN 1 ELSE 0 END AS INT) AS is_outlier
          |FROM d""".stripMargin,

      // the heap's (hash, id) order as a window — fine HERE because the
      // oracle runs at spec SF; the Spark side never sorts a bucket
      "q125_diversity_sample" -> {
        val hv = md5PrefixValueSql("CAST(vec_id AS VARCHAR)", 8)
        s"""WITH bk AS (SELECT vec_id, $hv AS hv,
           |  CAST(${embeddingBucketSql("embedding", EmbDim, 8)} AS BIGINT) AS bucket
           |  FROM embeddings),
           |r AS (SELECT bucket, vec_id, CAST(row_number() OVER (
           |  PARTITION BY bucket ORDER BY hv ASC, vec_id ASC) AS INT) AS "rank" FROM bk)
           |SELECT bucket, "rank", vec_id FROM r WHERE "rank" <= 3""".stripMargin
      },

      // cross-multiplied TV contributions: integer counts and products
      // only; BIGINT casts pin DuckDB's sum()-HUGEINT widening back
      "q126_vocab_drift" ->
        """WITH ta AS (SELECT unnest(string_split(text, ' ')) AS tok
          |  FROM documents WHERE doc_id % 2 = 0),
          |tb AS (SELECT unnest(string_split(text, ' ')) AS tok
          |  FROM documents WHERE doc_id % 2 = 1),
          |ca AS (SELECT tok, count(*) AS c_a FROM ta GROUP BY 1),
          |cb AS (SELECT tok, count(*) AS c_b FROM tb GROUP BY 1),
          |na AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a FROM ca),
          |nb AS (SELECT CAST(sum(c_b) AS BIGINT) AS n_b FROM cb),
          |j AS (SELECT coalesce(ca.tok, cb.tok) AS tok,
          |  coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
          |  FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
          |d AS (SELECT tok, c_a, c_b,
          |  CAST(abs(c_a * n_b - c_b * n_a) AS BIGINT) AS drift_num
          |  FROM j, na, nb),
          |top AS (SELECT * FROM d ORDER BY drift_num DESC, tok ASC LIMIT 20)
          |SELECT row_number() OVER (ORDER BY drift_num DESC, tok ASC) AS "rank",
          |  tok, c_a, c_b, drift_num FROM top""".stripMargin,

      // line explode via unnest + generate_subscripts (the q124 pattern);
      // document frequency per (source, trimmed line); reassembly is
      // string_agg ORDER BY pos — the same order Spark's array_sort of
      // (pos, line) structs pins
      "q127_boilerplate_scrub" ->
        """WITH d AS (SELECT doc_id, source,
          |  text || chr(10) || 'subscribe to ' || source || ' newsletter' ||
          |  CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'promo ' || source
          |       ELSE '' END AS text FROM documents),
          |ls AS (SELECT doc_id, source,
          |  unnest(string_split(text, chr(10))) AS line,
          |  CAST(generate_subscripts(string_split(text, chr(10)), 1) AS BIGINT) AS pos
          |  FROM d),
          |lk AS (SELECT doc_id, source, pos, line, trim(line) AS key FROM ls),
          |hd AS (SELECT source, CAST(count(*) AS BIGINT) AS host_docs
          |  FROM d GROUP BY 1),
          |df AS (SELECT source, key,
          |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM lk GROUP BY 1, 2),
          |bp AS (SELECT df.source, df.key FROM df JOIN hd USING (source)
          |  WHERE df.key <> '' AND n_docs >= 2
          |    AND CAST(n_docs AS DOUBLE) >= 0.5 * CAST(host_docs AS DOUBLE)),
          |kept AS (SELECT lk.* FROM lk WHERE NOT EXISTS (
          |  SELECT 1 FROM bp WHERE bp.source = lk.source AND bp.key = lk.key)),
          |re AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
          |  CAST(count(*) AS BIGINT) AS kept_lines FROM kept GROUP BY 1),
          |tot AS (SELECT doc_id, source,
          |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines FROM d)
          |SELECT t.doc_id, t.source, t.n_lines,
          |  CAST(t.n_lines - coalesce(re.kept_lines, 0) AS BIGINT) AS n_removed,
          |  coalesce(re.text_clean, '') AS text_clean
          |FROM tot t LEFT JOIN re USING (doc_id)""".stripMargin,

      // the canonicalization chain replayed rule-by-rule: every regex is
      // anchored (single-match), so DuckDB's replace-first ≡ Spark's
      // replace-all; list_sort/list_filter mirror array_sort/filter on
      // binary-collated ASCII
      "q128_url_canonical" ->
        """WITH u AS (SELECT doc_id,
          |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END) ||
          |  'Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
          |  (CASE WHEN doc_id % 11 = 0 THEN ':8080'
          |        WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) ||
          |  '/Page' || CAST(doc_id % 13 AS VARCHAR) ||
          |  (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
          |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1'
          |        WHEN doc_id % 4 = 1 THEN '?fbclid=z'
          |        WHEN doc_id % 4 = 3 THEN '?z=1&gclid=g&a=2' ELSE '' END) ||
          |  (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END) AS url
          |  FROM documents),
          |c1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
          |c2 AS (SELECT *, lower(regexp_extract(nofrag,
          |    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          |  regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM c1),
          |c3 AS (SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
          |  regexp_replace(rest, '^[^/?]*', '') AS pathq FROM c2),
          |c4 AS (SELECT *,
          |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
          |       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
          |       ELSE hostport END AS host,
          |  regexp_replace(pathq, '\?.*$', '') AS rawpath,
          |  CASE WHEN instr(pathq, '?') > 0
          |       THEN regexp_replace(pathq, '^[^?]*\?', '') ELSE '' END AS qs FROM c3),
          |c5 AS (SELECT *, array_to_string(list_sort(list_filter(
          |    string_split(qs, '&'),
          |    p -> NOT (p = '' OR regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)(=|$)')))),
          |    '&') AS canonq,
          |  CASE WHEN rawpath = '' THEN '/'
          |       ELSE regexp_replace(rawpath, '(.)/$', '\1') END AS path FROM c4)
          |SELECT doc_id, url,
          |  scheme || '://' || host || path ||
          |  CASE WHEN len(canonq) > 0 THEN '?' || canonq ELSE '' END AS url_canon
          |FROM c5""".stripMargin,

      // DSIR: hashed-bigram profiles as integer counts, per-bucket weight
      // ln(p̂_t/p̂_r) fixed-pointed once per distinct bucket (both products
      // integer-exact in the double domain, one correctly-rounded
      // division), doc scores order-independent integer sums
      "q129_dsir_weights" -> {
        val b = md5PrefixValueSql("shingle", 8)
        s"""WITH ${shingleCteFrom(2, "documents", "rg")},
           |${shingleCteFrom(2, "(SELECT * FROM documents WHERE lang = 'en')", "tg")},
           |rb AS (SELECT doc_id, ($b) % 65536 AS b FROM rg),
           |tb AS (SELECT ($b) % 65536 AS b FROM tg),
           |rp AS (SELECT b, count(*) AS cnt_r FROM rb GROUP BY 1),
           |tp AS (SELECT b, count(*) AS cnt_t FROM tb GROUP BY 1),
           |tot AS (SELECT CAST((SELECT sum(cnt_r) FROM rp) AS BIGINT) AS rtot,
           |               CAST((SELECT sum(cnt_t) FROM tp) AS BIGINT) AS ttot),
           |w AS (SELECT rp.b,
           |  CAST(floor(ln(
           |    CAST((coalesce(tp.cnt_t, 0) + 1) * (tot.rtot + 65536) AS DOUBLE) /
           |    CAST((rp.cnt_r + 1) * (tot.ttot + 65536) AS DOUBLE)) * 1000000 + 0.5)
           |    AS BIGINT) AS w_fp
           |  FROM rp LEFT JOIN tp USING (b), tot),
           |dc AS (SELECT doc_id, b, count(*) AS n_b FROM rb GROUP BY 1, 2),
           |sc AS (SELECT doc_id, CAST(sum(n_b) AS BIGINT) AS n_grams,
           |         CAST(sum(n_b * w_fp) AS BIGINT) AS dsir_fp
           |       FROM dc JOIN w USING (b) GROUP BY 1)
           |SELECT d.doc_id, coalesce(sc.n_grams, 0) AS n_grams,
           |  coalesce(sc.dsir_fp, 0) AS dsir_fp
           |FROM (SELECT DISTINCT doc_id FROM documents) d
           |LEFT JOIN sc USING (doc_id)""".stripMargin
      },

      // the deterministic resampling half: integer score grid (explicit
      // floor — DuckDB's double→int cast rounds, Spark's truncates),
      // running count over the ≤ bins-row bin table, whole bins share a
      // fate, verdicts joined back by bin
      "q130_dsir_select" -> {
        val b = md5PrefixValueSql("shingle", 8)
        s"""WITH ${shingleCteFrom(2, "documents", "rg")},
           |${shingleCteFrom(2, "(SELECT * FROM documents WHERE lang = 'en')", "tg")},
           |rb AS (SELECT doc_id, ($b) % 65536 AS b FROM rg),
           |tb AS (SELECT ($b) % 65536 AS b FROM tg),
           |rp AS (SELECT b, count(*) AS cnt_r FROM rb GROUP BY 1),
           |tp AS (SELECT b, count(*) AS cnt_t FROM tb GROUP BY 1),
           |tot AS (SELECT CAST((SELECT sum(cnt_r) FROM rp) AS BIGINT) AS rtot,
           |               CAST((SELECT sum(cnt_t) FROM tp) AS BIGINT) AS ttot),
           |w AS (SELECT rp.b,
           |  CAST(floor(ln(
           |    CAST((coalesce(tp.cnt_t, 0) + 1) * (tot.rtot + 65536) AS DOUBLE) /
           |    CAST((rp.cnt_r + 1) * (tot.ttot + 65536) AS DOUBLE)) * 1000000 + 0.5)
           |    AS BIGINT) AS w_fp
           |  FROM rp LEFT JOIN tp USING (b), tot),
           |dc AS (SELECT doc_id, b, count(*) AS n_b FROM rb GROUP BY 1, 2),
           |sc0 AS (SELECT doc_id, CAST(sum(n_b * w_fp) AS BIGINT) AS dsir_fp
           |        FROM dc JOIN w USING (b) GROUP BY 1),
           |sc AS (SELECT d.doc_id, coalesce(sc0.dsir_fp, 0) AS dsir_fp
           |       FROM (SELECT DISTINCT doc_id FROM documents) d
           |       LEFT JOIN sc0 USING (doc_id)),
           |rng AS (SELECT min(dsir_fp) AS lo, max(dsir_fp) AS hi FROM sc),
           |binned AS (SELECT doc_id, dsir_fp,
           |  CAST(floor(CAST((dsir_fp - rng.lo) * 50 AS DOUBLE) /
           |    CAST(rng.hi - rng.lo + 1 AS DOUBLE)) AS BIGINT) AS bin
           |  FROM sc, rng),
           |pb AS (SELECT bin, count(*) AS n_bin FROM binned GROUP BY 1),
           |v AS (SELECT bin,
           |  CAST((CAST(sum(n_bin) OVER (ORDER BY bin DESC) AS BIGINT) - n_bin) < 100
           |    AS INT) AS keep FROM pb)
           |SELECT binned.doc_id, binned.dsir_fp, binned.bin, v.keep
           |FROM binned JOIN v USING (bin)""".stripMargin
      },

      // posting lists: distinct (tok, doc) pairs, df band filter, then the
      // per-term lag window — DuckDB's lag default mirrors the −1 sentinel
      "q131_posting_lists" ->
        """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          |p AS (SELECT DISTINCT tok, doc_id FROM t),
          |d AS (SELECT tok, count(*) AS df FROM p GROUP BY 1
          |      HAVING count(*) BETWEEN 50 AND 400)
          |SELECT p.tok, d.df, p.doc_id,
          |  p.doc_id - lag(p.doc_id, 1, -1) OVER (PARTITION BY p.tok ORDER BY p.doc_id) AS gap
          |FROM p JOIN d USING (tok)""".stripMargin,

      // strip_html's regex chain replayed literally (the Java-regex/RE2
      // shared subset, global flag explicit in DuckDB), then the cleaning
      // functions over the stripped text — same expressions q14/q15 pin
      "q121_sql_cleaning" -> {
        val noBlocks =
          "regexp_replace(html, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g')"
        val noTags = s"regexp_replace($noBlocks, '<[^>]*>', ' ', 'g')"
        val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&nbsp;" -> " ", "&amp;" -> "&")
          .foldLeft(noTags) { case (c, (e, v)) => s"regexp_replace($c, '$e', '$v', 'g')" }
        val stripped = s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
        s"""WITH h AS (SELECT doc_id,
           |  '<html><body><p class="x">' || text ||
           |  '</p><script>var n=1;</script> &amp;fin</body></html>' AS html
           |  FROM documents),
           |s AS (SELECT doc_id, $stripped AS text FROM h)
           |SELECT doc_id, text,
           |  CAST(${tokenCountSql("text")} AS BIGINT) AS n_tok,
           |  ${langCase("text")} AS lang,
           |  $qualityExpr AS q
           |FROM s""".stripMargin
      },

      // the crawl fixture's closed form re-derived without bytes: record
      // r's URL collapses re-fetches (r%10=9 → r−9), the canonical fetch
      // per URL is min r (path order = crawl order), and the canonical
      // text is the base form (tbase = r−8 for text-dup records; junk at
      // tbase%1000=0) — canonical rows never carry the refetch prefix
      // because the original always precedes its re-fetch
      "q118_crawl_docs" ->
        s"""WITH nf AS (SELECT count(*) AS n FROM documents WHERE doc_id % 7 = 0),
           |recs AS (SELECT unnest(generate_series(0, (SELECT n FROM nf) * 13 - 1)) AS r),
           |u AS (SELECT r,
           |  CASE WHEN r % 10 = 9 THEN r - 9 ELSE r END AS ubase
           |  FROM recs),
           |canon AS (SELECT 'http://h' || CAST(ubase % 97 AS VARCHAR) || '.example/p' ||
           |    CAST(ubase AS VARCHAR) AS url,
           |  'h' || CAST(ubase % 97 AS VARCHAR) || '.example' AS source,
           |  min(r) AS rmin FROM u GROUP BY 1, 2),
           |t AS (SELECT url, source,
           |  CASE WHEN rmin % 10 = 8 THEN rmin - 8 ELSE rmin END AS tbase FROM canon),
           |txt AS (SELECT url, source,
           |  CASE WHEN tbase % 1000 = 0 THEN 'j' || repeat('x', 2499)
           |       ELSE array_to_string(list_transform(generate_series(0, 33),
           |         i -> 't' || CAST(100000000 + tbase * 50 + i AS VARCHAR)), ' ')
           |         || ' the and' END AS text
           |  FROM t)
           |SELECT url, source, text,
           |  CAST(${tokenCountSql("text")} AS BIGINT) AS n_tok
           |FROM txt""".stripMargin,

      // every pixel of an 8×8 block carries the block value, so sums are
      // 64 × the block closed form — no JPEG byte is ever touched
      "q117_mjpeg_decode" ->
        """WITH vids AS (
          |  SELECT doc_id AS id, 1 + doc_id % 2 AS nbx, 1 + doc_id % 3 AS nby,
          |         2 + doc_id % 4 AS nf
          |  FROM documents WHERE doc_id % 9 = 0),
          |bx AS (
          |  SELECT id, nbx, nby, nf, unnest(generate_series(0, nf * nbx * nby - 1)) AS q
          |  FROM vids),
          |v AS (
          |  SELECT id, nbx, nby, nf, q // (nbx * nby) AS f,
          |    (id * 31 + (q // (nbx * nby)) * 29 + ((q % (nbx * nby)) % nbx) * 7
          |       + ((q % (nbx * nby)) // nbx) * 13) % 256 AS bv
          |  FROM bx)
          |SELECT id, CAST(nbx * 8 AS BIGINT) AS width, CAST(nby * 8 AS BIGINT) AS height,
          |  CAST(nf AS BIGINT) AS n_frames,
          |  CAST(64 * SUM(bv) AS BIGINT) AS luma_sum,
          |  CAST(64 * SUM((f + 1) * bv) AS BIGINT) AS frame_weighted_sum
          |FROM v GROUP BY id, nbx, nby, nf""".stripMargin,

      "q75_video_decode" ->
        """WITH vids AS (
          |  SELECT doc_id AS id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h,
          |         2 + doc_id % 4 AS nf
          |  FROM documents WHERE doc_id % 13 = 0),
          |px AS (
          |  SELECT id, w, h, nf, unnest(generate_series(0, nf * w * h - 1)) AS q FROM vids),
          |v AS (
          |  SELECT id, w, h, nf, q // (w * h) AS f,
          |    (id * 31 + (q // (w * h)) * 29 + ((q % (w * h)) % w) * 7
          |       + ((q % (w * h)) // w) * 13) % 256 AS luma
          |  FROM px)
          |SELECT id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          |  CAST(nf AS BIGINT) AS n_frames,
          |  CAST(SUM(luma) AS BIGINT) AS luma_sum,
          |  CAST(SUM((f + 1) * luma) AS BIGINT) AS frame_weighted_sum
          |FROM v GROUP BY id, w, h, nf""".stripMargin,

      "q69_audio_decode" ->
        """WITH wavs AS (
          |  SELECT doc_id AS id, 64 + doc_id % 33 AS n,
          |         8000 + (doc_id % 3) * 4000 AS rate
          |  FROM documents WHERE doc_id % 7 = 0),
          |s AS (
          |  SELECT id, n, rate, unnest(generate_series(0, n - 1)) AS i FROM wavs),
          |v AS (
          |  SELECT id, n, rate, (id * 37 + i * 101) % 4001 - 2000 AS samp FROM s)
          |SELECT id, CAST(rate AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
          |  CAST(SUM(samp) AS BIGINT) AS amp_sum, CAST(SUM(ABS(samp)) AS BIGINT) AS abs_sum
          |FROM v GROUP BY id, n, rate""".stripMargin,

      // the decoded-pixel sums re-derived from the pixel formula alone
      // (scalar generate_series + unnest in a CTE — DuckDB 1.0's lateral
      // limitation on the table function form)
      "q67_image_decode" ->
        """WITH imgs AS (
          |  SELECT doc_id AS id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
          |  FROM documents WHERE doc_id % 5 = 0),
          |px AS (
          |  SELECT id, w, h, unnest(generate_series(0, w * h - 1)) AS p FROM imgs)
          |SELECT id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          |  CAST(w * h AS BIGINT) AS n_px,
          |  CAST(SUM((id * 31 + (p % w) * 7 + (p // w) * 13) % 256) AS BIGINT) AS px_sum
          |FROM px GROUP BY id, w, h""".stripMargin,

      // the golden ranked report re-derived with no image in sight: vector
      // components from the pixel closed form (float32 division is exactly
      // rounded, so CAST(.. AS REAL)/CAST(255 AS REAL) is bit-identical to
      // the JVM's px/255.0f), distances via the unrolled left-associative
      // l2Sql, ranks via the same (dist, id) total order
      "q76_golden_image_report" -> {
        val comp = "CAST(CAST((id * 31 + (((p % 8) * w) // 8) * 7 + (((p // 8) * h) // 8) * 13) % 256 AS REAL) / CAST(255 AS REAL) AS REAL)"
        s"""WITH imgs AS (SELECT doc_id AS id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           |  FROM documents WHERE doc_id % 5 = 0),
           |vecs AS (SELECT id, list_transform(generate_series(0, 63), p -> $comp) AS v FROM imgs),
           |qs AS (SELECT id AS qid, v AS qv FROM vecs WHERE id % 25 = 0),
           |scored AS (SELECT qs.qid, i.id, ${l2Sql("qs.qv", "i.v", 64)} AS dist FROM qs, vecs i),
           |r AS (SELECT qid, id, dist,
           |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rn FROM scored)
           |SELECT qid, CAST(rn AS INT) AS rank, id, dist,
           |  'class_' || CAST(id % 10 AS VARCHAR) AS label_name,
           |  CASE WHEN id = qid THEN '<- QUERY' ELSE '' END AS marker
           |FROM r WHERE rn <= 5""".stripMargin
      },

      // self-match through the real HNSW graph: the oracle is the identity
      // table — rank-1 must be the query itself at distance exactly 0
      "q77_golden_selfmatch" ->
        """SELECT doc_id AS qid, doc_id AS match_id, CAST(0.0 AS DOUBLE) AS dist
          |FROM documents WHERE doc_id % 5 = 0""".stripMargin,

      "q66_triage_dedup" ->
        s"""WITH ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |lsh AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |surv AS (SELECT l.id_a, l.id_b
           |  FROM lsh l JOIN sig sa ON sa.doc_id = l.id_a JOIN sig sb ON sb.doc_id = l.id_b
           |  WHERE CAST(${(0 until 4).map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")} AS DOUBLE) / 4.0 >= 0.5),
           |sd AS (SELECT DISTINCT doc_id, shingle FROM shingles),
           |sz AS (SELECT doc_id, count(*) AS n_sh FROM sd GROUP BY 1),
           |it AS (SELECT p.id_a, p.id_b, count(*) AS n_inter
           |  FROM surv p
           |  JOIN sd a ON a.doc_id = p.id_a
           |  JOIN sd b ON b.doc_id = p.id_b AND b.shingle = a.shingle
           |  GROUP BY 1, 2)
           |SELECT p.id_a, p.id_b, COALESCE(it.n_inter, 0) AS n_inter,
           |  CASE WHEN COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) = 0
           |       THEN 0.0
           |       ELSE CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
           |            CAST(COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) AS DOUBLE)
           |  END AS jaccard,
           |  (CASE WHEN COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) = 0
           |        THEN 0.0
           |        ELSE CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
           |             CAST(COALESCE(sa.n_sh, 0) + COALESCE(sb.n_sh, 0) - COALESCE(it.n_inter, 0) AS DOUBLE)
           |   END) >= 0.4 AS is_dup
           |FROM surv p
           |LEFT JOIN it ON it.id_a = p.id_a AND it.id_b = p.id_b
           |LEFT JOIN sz sa ON sa.doc_id = p.id_a
           |LEFT JOIN sz sb ON sb.doc_id = p.id_b""".stripMargin,

      "q65_minhash_estimate" ->
        s"""WITH ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id)
           |SELECT p.id_a, p.id_b,
           |  CAST(${(0 until 4).map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS n_agree,
           |  CAST(${(0 until 4).map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")} AS DOUBLE) / 4.0 AS est_jaccard
           |FROM prs p JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sb ON sb.doc_id = p.id_b""".stripMargin,

      "q64_dedup_metrics" ->
        s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 2),
           |allc AS (SELECT doc_id, text FROM corp
           |  UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM corp WHERE doc_id % 50 = 7),
           |${shingleCteFrom(3, "allc", "ash")},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"min(md5(concat('s$i|', shingle))) AS mh$i").mkString(", ")}
           |  FROM ash GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |pred AS (SELECT DISTINCT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id),
           |tr AS (SELECT DISTINCT least(doc_id, doc_id + 10000) AS id_a,
           |    greatest(doc_id, doc_id + 10000) AS id_b
           |  FROM corp WHERE doc_id % 50 = 7),
           |j AS (SELECT COALESCE(p.in_p, 0) AS in_p, COALESCE(t.in_t, 0) AS in_t FROM
           |  (SELECT id_a, id_b, 1 AS in_p FROM pred) p
           |  FULL OUTER JOIN (SELECT id_a, id_b, 1 AS in_t FROM tr) t
           |  USING (id_a, id_b)),
           |m AS (SELECT CAST(sum(in_p) AS BIGINT) AS n_pred, CAST(sum(in_t) AS BIGINT) AS n_truth,
           |    CAST(sum(in_p * in_t) AS BIGINT) AS n_tp FROM j)
           |SELECT n_pred, n_truth, n_tp,
           |  CASE WHEN n_pred = 0 THEN 0.0
           |       ELSE CAST(n_tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS precision,
           |  CASE WHEN n_truth = 0 THEN 0.0
           |       ELSE CAST(n_tp AS DOUBLE) / CAST(n_truth AS DOUBLE) END AS recall
           |FROM m""".stripMargin,

      "q61_bpe_pairs" ->
        """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
          |vocab AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1 HAVING len(tok) >= 2),
          |idx AS (SELECT tok, n_tok, unnest(generate_series(1, len(tok) - 1)) AS i FROM vocab),
          |pr AS (SELECT substring(tok, i, 2) AS pair, CAST(sum(n_tok) AS BIGINT) AS n_pair
          |  FROM idx GROUP BY 1)
          |SELECT pair, n_pair FROM pr
          |ORDER BY n_pair DESC, pair LIMIT 20""".stripMargin,

      // the trainer loop unrolled: per round, pair counts over the
      // space-split symbol strings, a 1-row argmax CTE, and the same
      // left-to-right replace the JVM applies
      "q79_bpe_train" -> {
        val k = 5
        val sel = (1 to k).map(i =>
          s"SELECT CAST($i AS INT) AS rank, pair, replace(pair, ' ', '') AS merged, n_pair FROM b$i")
          .mkString("\nUNION ALL\n")
        s"""WITH ${bpeTrainCtes(k)}
           |$sel""".stripMargin
      },

      // the trainer CTEs reused, then the learned merges replayed over
      // EVERY document token: pad once, fold the k replaces in rank
      // order, count the double-space separators
      "q80_bpe_segment" -> {
        val k = 5
        val applied = (1 to k).foldLeft("s0") { (acc, i) =>
          s"replace($acc, ' ' || (SELECT replace(pair, ' ', '  ') FROM b$i) || ' ', ' ' || (SELECT replace(pair, ' ', '') FROM b$i) || ' ')"
        }
        s"""WITH ${bpeTrainCtes(k)},
           |dtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |seg AS (SELECT doc_id,
           |  ' ' || array_to_string(list_transform(generate_series(1, len(tok)),
           |    j -> substr(tok, j, 1)), '  ') || ' ' AS s0
           |  FROM dtoks WHERE len(tok) >= 1)
           |SELECT doc_id, count(*) AS n_tokens,
           |  CAST(sum(len(string_split(trim($applied), '  '))) AS BIGINT) AS n_syms
           |FROM seg GROUP BY doc_id""".stripMargin
      },

      // the trainer CTEs + the replay chain again, but emitting ids: base
      // vocabulary = binary-sorted distinct corpus chars (row_number - 1),
      // merge symbols at nBase + rank - 1 (first rank wins on a re-derived
      // string), per-(token, symbol) vocab join, ordered list per doc
      "q148_bpe_token_ids" -> bpeIdsOracle(trailer =
        """SELECT doc_id,
          |  array_to_string(list(token_id ORDER BY tpos, spos), ',') AS token_ids
          |FROM ids GROUP BY doc_id""".stripMargin),

      // q148's id chain packed: exact prefix sum over doc ids, integer
      // division into sequences, in-order concat of the id arrays
      "q149_packed_token_ids" -> bpeIdsOracle(trailer =
        """docids AS (SELECT doc_id, list(token_id ORDER BY tpos, spos) AS token_ids
          |  FROM ids GROUP BY doc_id),
          |counted AS (SELECT doc_id, CAST(len(token_ids) AS BIGINT) AS n_tok, token_ids FROM docids),
          |pref AS (SELECT doc_id, n_tok, token_ids,
          |  CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
          |  FROM counted)
          |SELECT strt // 5000 AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
          |  array_to_string(flatten(list(token_ids ORDER BY doc_id)), ',') AS token_ids
          |FROM pref GROUP BY 1""".stripMargin, trailerIsCte = true),

      "q81_bm25_topk" ->
        s"""WITH ${bm25Ctes(Bm25Terms)}
           |SELECT doc_id, bm25 FROM bmscore ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

      "q87_phrase_bm25" -> {
        val shingleTok =
          """SELECT doc_id, concat_ws(' ', w[i], w[i+1]) AS tok FROM (
            |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM (
            |    SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin
        s"""WITH ${bm25Ctes(Bm25Phrases, shingleTok)}
           |SELECT doc_id, bm25 FROM bmscore ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
      },

      "q82_hybrid_rrf" ->
        s"""WITH ${bm25Ctes(Bm25Terms)},
           |bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS r FROM bmscore),
           |lex AS (SELECT doc_id, r FROM bmr WHERE r <= 20),
           |vsc AS (SELECT e.vec_id AS doc_id, ${cosineSql("e.embedding", "q.embedding", EmbDim)} AS dist
           |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 42) q),
           |vr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY dist ASC, doc_id ASC) AS INT) AS r FROM vsc),
           |vec AS (SELECT doc_id, r FROM vr WHERE r <= 20),
           |fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           |    COALESCE(1.0 / (60 + l.r), 0.0) + COALESCE(1.0 / (60 + v.r), 0.0) AS rrf
           |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
           |SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

      "q83_lm_score" ->
        s"""WITH ${shingleCteFrom(2, "documents", "bg")},
           |docbg AS (SELECT doc_id, shingle AS bigram, count(*) AS n FROM bg GROUP BY 1, 2),
           |pc AS (SELECT bigram, CAST(sum(n) AS BIGINT) AS n_pair FROM docbg GROUP BY 1),
           |fc AS (SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(n_pair) AS BIGINT) AS n_first FROM pc GROUP BY 1),
           |lp AS (SELECT bigram,
           |  CAST(floor(ln(CAST(n_pair AS DOUBLE) / CAST(n_first AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_fp
           |  FROM pc JOIN fc ON string_split(pc.bigram, ' ')[1] = fc.w1),
           |g AS (SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
           |    CAST(sum(d.n * l.lp_fp) AS BIGINT) AS lp_total_fp
           |  FROM docbg d JOIN lp l ON l.bigram = d.bigram GROUP BY 1)
           |SELECT doc_id, n_bigrams, lp_total_fp,
           |  (CAST(lp_total_fp AS DOUBLE) / 1000000.0) / CAST(n_bigrams AS DOUBLE) AS avg_nats
           |FROM g""".stripMargin,

      // q83's score CTE + centi-nat histogram thresholds (whole bins
      // share a bucket — the scale-sane percentile)
      "q96_perplexity_buckets" ->
        s"""WITH ${shingleCteFrom(2, "documents", "bg")},
           |docbg AS (SELECT doc_id, shingle AS bigram, count(*) AS n FROM bg GROUP BY 1, 2),
           |pc AS (SELECT bigram, CAST(sum(n) AS BIGINT) AS n_pair FROM docbg GROUP BY 1),
           |fc AS (SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(n_pair) AS BIGINT) AS n_first FROM pc GROUP BY 1),
           |lp AS (SELECT bigram,
           |  CAST(floor(ln(CAST(n_pair AS DOUBLE) / CAST(n_first AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_fp
           |  FROM pc JOIN fc ON string_split(pc.bigram, ' ')[1] = fc.w1),
           |g AS (SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
           |    CAST(sum(d.n * l.lp_fp) AS BIGINT) AS lp_total_fp
           |  FROM docbg d JOIN lp l ON l.bigram = d.bigram GROUP BY 1),
           |binned AS (SELECT doc_id,
           |  (CAST(lp_total_fp AS DOUBLE) / 1000000.0) / CAST(n_bigrams AS DOUBLE) AS avg_nats,
           |  CAST(floor(((CAST(lp_total_fp AS DOUBLE) / 1000000.0) / CAST(n_bigrams AS DOUBLE)) * 100.0) AS BIGINT) AS bin
           |  FROM g),
           |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM binned GROUP BY 1),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM bins),
           |cum AS (SELECT a.bin, CAST(sum(b.n) AS BIGINT) AS c
           |  FROM bins a JOIN bins b ON b.bin >= a.bin GROUP BY 1),
           |lab AS (SELECT bin,
           |  CASE WHEN c * 3 <= t THEN 'head' WHEN c * 3 <= t * 2 THEN 'middle' ELSE 'tail' END AS bucket
           |  FROM cum, tot)
           |SELECT binned.doc_id, binned.avg_nats, binned.bin, lab.bucket
           |FROM binned JOIN lab USING (bin)""".stripMargin,

      // q83's CTE split train/apply: LM from even doc_ids, scores for odd
      // ones, unmatched bigrams at the -20e6 micro-nat floor
      "q100_lm_frozen" ->
        s"""WITH ${shingleCteFrom(2, "(SELECT * FROM documents WHERE doc_id % 2 = 0)", "tbg")},
           |pc AS (SELECT shingle AS bigram, CAST(count(*) AS BIGINT) AS n_pair FROM tbg GROUP BY 1),
           |fc AS (SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(n_pair) AS BIGINT) AS n_first FROM pc GROUP BY 1),
           |lp AS (SELECT bigram,
           |  CAST(floor(ln(CAST(n_pair AS DOUBLE) / CAST(n_first AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_fp
           |  FROM pc JOIN fc ON string_split(pc.bigram, ' ')[1] = fc.w1),
           |${shingleCteFrom(2, "(SELECT * FROM documents WHERE doc_id % 2 = 1)", "abg")},
           |docbg AS (SELECT doc_id, shingle AS bigram, count(*) AS n FROM abg GROUP BY 1, 2),
           |g AS (SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
           |    CAST(sum(d.n * COALESCE(l.lp_fp, -20000000)) AS BIGINT) AS lp_total_fp
           |  FROM docbg d LEFT JOIN lp l ON l.bigram = d.bigram GROUP BY 1)
           |SELECT doc_id, n_bigrams, lp_total_fp,
           |  (CAST(lp_total_fp AS DOUBLE) / 1000000.0) / CAST(n_bigrams AS DOUBLE) AS avg_nats
           |FROM g""".stripMargin,

      // multinomial NB with add-one smoothing: integer counts, per-row
      // fixed-point ln — the zero-count class rows come from the vocab ×
      // {0,1} grid, exactly as the engine builds them
      "q101_nb_model" ->
        s"""WITH train AS (SELECT CASE WHEN source IN $nbCuratedSql THEN 1 ELSE 0 END AS cls, text
           |  FROM documents WHERE doc_id % 2 = 0),
           |toks AS (SELECT cls, unnest(string_split(text, ' ')) AS tok FROM train),
           |wc AS (SELECT tok, cls, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2),
           |vocab AS (SELECT DISTINCT tok FROM wc),
           |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
           |nc AS (SELECT cls, CAST(sum(n) AS BIGINT) AS n_c FROM wc GROUP BY 1),
           |grid AS (SELECT tok, c.cls FROM vocab, (SELECT 0 AS cls UNION ALL SELECT 1) c),
           |m AS (SELECT g.tok, g.cls, COALESCE(w.n, 0) AS n_wc
           |  FROM grid g LEFT JOIN wc w ON w.tok = g.tok AND w.cls = g.cls)
           |SELECT m.tok, m.cls, m.n_wc,
           |  CAST(floor(ln(CAST(m.n_wc + 1 AS DOUBLE) / CAST(nc.n_c + v.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_fp
           |FROM m JOIN nc ON nc.cls = m.cls, v""".stripMargin,

      // q101's model applied to the odd half: per-doc integer llr sums;
      // docs with no model-known token drop on both sides (inner join)
      "q102_nb_score" ->
        s"""WITH $nbScoreCtes
           |SELECT sc.doc_id, sc.n_known,
           |  (sc.s1 + p1.p1) - (sc.s0 + p0.p0) AS llr_fp,
           |  CAST(((sc.s1 + p1.p1) - (sc.s0 + p0.p0)) > 0 AS INT) AS pred_hq
           |FROM sc, p1, p0""".stripMargin,

      // the calibration sweep over q102's scores: integer bin grid
      // (explicit floor), confusion counts as cumulative integer sums
      // over the ≤ bins-row bin table, prec/rec one exact division each
      "q132_pr_sweep" ->
        s"""WITH $nbScoreCtes,
           |scored AS (SELECT sc.doc_id,
           |    (sc.s1 + p1.p1) - (sc.s0 + p0.p0) AS llr_fp FROM sc, p1, p0),
           |lab AS (SELECT s.doc_id, s.llr_fp,
           |    CASE WHEN d.source IN $nbCuratedSql THEN 1 ELSE 0 END AS label
           |  FROM scored s JOIN documents d USING (doc_id)),
           |rng AS (SELECT min(llr_fp) AS lo, max(llr_fp) AS hi FROM lab),
           |binned AS (SELECT doc_id, llr_fp, label,
           |  CAST(floor(CAST((llr_fp - rng.lo) * 20 AS DOUBLE) /
           |    CAST(rng.hi - rng.lo + 1 AS DOUBLE)) AS BIGINT) AS bin
           |  FROM lab, rng),
           |pb AS (SELECT bin, CAST(min(llr_fp) AS BIGINT) AS thr_fp,
           |    CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS n_pos
           |  FROM binned GROUP BY 1),
           |tpos AS (SELECT CAST(sum(label) AS BIGINT) AS total_pos FROM lab),
           |cum AS (SELECT bin, thr_fp, n, n_pos,
           |    CAST(sum(n_pos) OVER (ORDER BY bin DESC) AS BIGINT) AS tp,
           |    CAST(sum(n) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_n
           |  FROM pb)
           |SELECT bin, thr_fp, n, n_pos, tp, cum_n - tp AS fp,
           |  total_pos - tp AS fn,
           |  CAST(tp AS DOUBLE) / CAST(cum_n AS DOUBLE) AS prec,
           |  CAST(tp AS DOUBLE) / CAST(total_pos AS DOUBLE) AS rec
           |FROM cum, tpos""".stripMargin,

      // the CLI composite end-to-end: every stage CTE is the pinned
      // oracle form of its stage query (q47 gate, q10 canonical, q39
      // decontam, q104 budget), composed over the train split and
      // finished with the curriculum-key arithmetic
      "q116_prepare" -> {
        val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH train AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 50 <> 0),
           |benchd AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
           |w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM train),
           |a AS (SELECT doc_id, count(*) AS n_words,
           |  CAST(sum(len(tok)) AS BIGINT) AS sum_len,
           |  CAST(max(len(tok)) AS BIGINT) AS max_word_len,
           |  count(DISTINCT tok) AS n_distinct,
           |  CAST(sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
           |  FROM w GROUP BY 1),
           |keepg AS (SELECT doc_id FROM a
           |  WHERE n_words >= 30 AND n_words <= 100000
           |    AND CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
           |    AND CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0
           |    AND n_stop >= 2
           |    AND 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.55
           |    AND max_word_len <= 15),
           |gated AS (SELECT t.doc_id, t.source, t.text FROM train t
           |  JOIN keepg USING (doc_id) WHERE $qualityExpr >= 0.3),
           |canon AS (SELECT doc_id, source, text FROM (SELECT doc_id, source, text,
           |  min(doc_id) OVER (PARTITION BY md5(lower(text))) AS cid FROM gated)
           |  WHERE doc_id = cid),
           |${shingleCteFrom(3, "benchd", "bsh")},
           |${shingleCteFrom(3, "canon", "csh")},
           |bs AS (SELECT DISTINCT shingle FROM bsh),
           |contaminated AS (SELECT tsd.doc_id FROM (SELECT DISTINCT doc_id, shingle FROM csh) tsd
           |  JOIN bs ON tsd.shingle = bs.shingle GROUP BY 1 HAVING count(*) >= 5),
           |clean AS (SELECT c.doc_id, c.source, c.text FROM canon c
           |  LEFT JOIN contaminated x ON c.doc_id = x.doc_id WHERE x.doc_id IS NULL),
           |s AS (SELECT source, doc_id, text,
           |    CAST(${tokenCountSql("text")} AS BIGINT) AS n_tok,
           |    CAST(floor(($qualityExpr) * 1000) AS BIGINT) AS bin
           |  FROM clean),
           |bt AS (SELECT source, bin, CAST(sum(n_tok) AS BIGINT) AS bin_tok FROM s GROUP BY 1, 2),
           |c AS (SELECT source, bin, bin_tok,
           |    CAST(sum(bin_tok) OVER (PARTITION BY source ORDER BY bin DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
           |  FROM bt),
           |k AS (SELECT source, bin FROM c WHERE cum_tok - bin_tok < 2000),
           |sel AS (SELECT s.doc_id, s.source, s.text, s.n_tok, s.bin
           |  FROM s JOIN k USING (source, bin)),
           |clean2 AS (SELECT sel.*, ${md5PrefixValueSql("CAST(sel.doc_id AS VARCHAR)", 15)} AS h
           |  FROM sel)
           |SELECT doc_id, source, text, n_tok, bin, bin AS tier,
           |  h % 8 AS shard, bin * 8 + (h % 8) AS ck, h
           |FROM clean2""".stripMargin
      },

      // histogram budget fill: the window runs over quality BINS
      // (≤ 1001 rows per source), never the doc stream
      "q104_token_budget" ->
        s"""WITH s AS (SELECT source, doc_id,
           |    CAST(${tokenCountSql("text")} AS BIGINT) AS n_tok,
           |    CAST(floor(($qualityExpr) * 1000) AS BIGINT) AS bin
           |  FROM documents),
           |bt AS (SELECT source, bin, CAST(sum(n_tok) AS BIGINT) AS bin_tok FROM s GROUP BY 1, 2),
           |c AS (SELECT source, bin, bin_tok,
           |    CAST(sum(bin_tok) OVER (PARTITION BY source ORDER BY bin DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
           |  FROM bt),
           |k AS (SELECT source, bin, CAST(cum_tok - bin_tok < 2000 AS INT) AS keep FROM c)
           |SELECT s.source, s.doc_id, s.n_tok, s.bin, k.keep
           |FROM s JOIN k USING (source, bin)""".stripMargin,

      // the oracle uses the per-source window the engine's heap replaces;
      // tie-break mirrors the heap's (score desc, 48-bit md5 prefix asc)
      "q103_source_signature" ->
        s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
           |tf AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
           |dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_grp FROM tf GROUP BY 1),
           |ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_grp FROM documents),
           |sig AS (SELECT tf.source, tf.tok,
           |    tf.tf * CAST(floor(ln(CAST(n_grp AS DOUBLE) / CAST(df_grp AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS score_fp,
           |    ${md5PrefixValueSql("tf.tok", 12)} AS h
           |  FROM tf JOIN dfs USING (tok), ns
           |  WHERE floor(ln(CAST(n_grp AS DOUBLE) / CAST(df_grp AS DOUBLE)) * 1000000.0 + 0.5) > 0),
           |r AS (SELECT source, tok, score_fp,
           |    row_number() OVER (PARTITION BY source ORDER BY score_fp DESC, h) AS rn
           |  FROM sig)
           |SELECT source, CAST(rn AS INT) AS "rank", tok, score_fp FROM r WHERE rn <= 5""".stripMargin,

      // the k-th order statistic via a per-source window the engine's
      // dedup heap never needs; 127·2^32 is an exact double product
      "q99_kmv_vocab" ->
        s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
           |h AS (SELECT DISTINCT source, ${md5PrefixValueSql("tok", 8)} AS h FROM toks),
           |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
           |top AS (SELECT source, CAST(count(*) AS INT) AS n_sketch, max(h) AS kth_hash
           |  FROM r WHERE rn <= 128 GROUP BY 1)
           |SELECT source, n_sketch, kth_hash,
           |  CASE WHEN n_sketch < 128 THEN CAST(n_sketch AS DOUBLE)
           |       ELSE (127.0 * 4294967296.0) / CAST(kth_hash AS DOUBLE) END AS est_distinct
           |FROM top""".stripMargin,

      // the oracle may use the window the engine must not: a per-source
      // row_number over q15's quality expression
      "q97_domain_cap" ->
        s"""WITH s AS (SELECT source, doc_id, $qualityExpr AS quality FROM documents),
           |r AS (SELECT source, doc_id, quality,
           |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn FROM s)
           |SELECT source, CAST(rn AS INT) AS "rank", doc_id, quality FROM r WHERE rn <= 25""".stripMargin,

      "q84_bm25_batch" ->
        s"""WITH $bm25BatchCtes
           |SELECT qid, "rank", doc_id, CAST(score_fp AS DOUBLE) / 1000000.0 AS bm25
           |FROM bmranked WHERE "rank" <= 10""".stripMargin,

      "q86_retrieval_eval" -> {
        // the SAME fixed-point discount literals the Spark plan inlines —
        // neither engine evaluates a log2 at runtime
        val w = graft.operators.Retrieval.ndcgWeightsFp(10).mkString(", ")
        val c = graft.operators.Retrieval.ndcgIdealFp(10).mkString(", ")
        s"""WITH $bm25BatchCtes,
           |topk AS (SELECT qid, doc_id, "rank" FROM bmranked WHERE "rank" <= 10),
           |dt AS (SELECT DISTINCT doc_id, tok FROM bmtoks),
           |nt AS (SELECT qid, count(DISTINCT tok) AS n_terms FROM qt GROUP BY 1),
           |mt AS (SELECT q.qid, d.doc_id, count(*) AS n_match FROM dt d JOIN qt q USING (tok) GROUP BY 1, 2),
           |truth AS (SELECT mt.qid, mt.doc_id FROM mt JOIN nt USING (qid) WHERE mt.n_match = nt.n_terms),
           |nrel AS (SELECT qid, count(*) AS n_rel FROM truth GROUP BY 1),
           |hits AS (SELECT r.qid, count(*) AS hits_at_k, min(r."rank") AS first_rel_rank,
           |  CAST(sum(([$w])[CAST(r."rank" AS INT)]) AS BIGINT) AS dcg_fp
           |  FROM topk r JOIN truth t ON t.qid = r.qid AND t.doc_id = r.doc_id GROUP BY 1)
           |SELECT n.qid, n.n_rel, COALESCE(h.hits_at_k, 0) AS hits_at_k,
           |  CAST(COALESCE(h.hits_at_k, 0) AS DOUBLE) / 10 AS prec_at_k,
           |  CAST(COALESCE(h.hits_at_k, 0) AS DOUBLE) / CAST(n.n_rel AS DOUBLE) AS recall_at_k,
           |  COALESCE(1.0 / h.first_rel_rank, 0.0) AS rr,
           |  CAST(COALESCE(h.dcg_fp, 0) AS BIGINT) AS dcg_fp,
           |  CAST(([$c])[CAST(least(n.n_rel, 10) AS INT)] AS BIGINT) AS idcg_fp,
           |  CAST(COALESCE(h.dcg_fp, 0) AS DOUBLE)
           |    / CAST(([$c])[CAST(least(n.n_rel, 10) AS INT)] AS DOUBLE) AS ndcg
           |FROM nrel n LEFT JOIN hits h USING (qid)""".stripMargin
      },

      "q85_tfidf_bow" ->
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |bow AS (SELECT doc_id, ${md5PrefixValueSql("tok", 8)} % 64 AS bucket, count(*) AS tf
           |  FROM toks GROUP BY 1, 2),
           |dfb AS (SELECT bucket, count(*) AS df FROM bow GROUP BY 1),
           |stats AS (SELECT count(*) AS nd FROM documents),
           |idf AS (SELECT bucket,
           |  CAST(floor(ln(CAST(nd + 1 AS DOUBLE) / (df + 1)) * 1000000.0 + 0.5) AS BIGINT) AS idf_fp
           |  FROM dfb, stats)
           |SELECT b.doc_id, b.bucket, b.tf, i.idf_fp, b.tf * i.idf_fp AS w_fp
           |FROM bow b JOIN idf i USING (bucket)""".stripMargin,

      // perceptual hashes re-derived with no image in sight: resized
      // pixels from the closed form (q67's trick), mean threshold kept
      // in integers (v·64 > Σv), hashes reassembled as SUMs of powers of
      // two over the two 32-bit halves
      "q88_image_phash" -> {
        def px(sx: String, sy: String) =
          s"(bid * 31 + ($sx) * 7 + ($sy) * 13 + (CASE WHEN ($sy) = 0 THEN delta ELSE 0 END)) % 256"
        s"""WITH imgs AS (SELECT doc_id AS id, doc_id AS bid, 0 AS delta,
           |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           |  FROM documents WHERE doc_id % 5 = 0),
           |px8 AS (SELECT id, bid, delta, w, h, unnest(generate_series(0, 63)) AS p FROM imgs),
           |r8 AS (SELECT id, p, ${px("((p % 8) * w) // 8", "((p // 8) * h) // 8")} AS v FROM px8),
           |s8 AS (SELECT id, SUM(v) AS tot FROM r8 GROUP BY id),
           |ah AS (SELECT r8.id,
           |  CAST(SUM(CASE WHEN v * 64 > tot AND p >= 32 THEN (CAST(1 AS BIGINT) << (p - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
           |  CAST(SUM(CASE WHEN v * 64 > tot AND p < 32 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS ahash_lo
           |  FROM r8 JOIN s8 USING (id) GROUP BY r8.id),
           |px9 AS (SELECT id, bid, delta, w, h, unnest(generate_series(0, 71)) AS q FROM imgs),
           |r9 AS (SELECT id, q % 9 AS x, q // 9 AS y,
           |    ${px("((q % 9) * w) // 9", "((q // 9) * h) // 8")} AS v FROM px9),
           |dh AS (SELECT a.id,
           |  CAST(SUM(CASE WHEN b.v > a.v AND a.y * 8 + a.x >= 32 THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x - 32)) ELSE 0 END) AS BIGINT) AS dhash_hi,
           |  CAST(SUM(CASE WHEN b.v > a.v AND a.y * 8 + a.x < 32 THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x)) ELSE 0 END) AS BIGINT) AS dhash_lo
           |  FROM r9 a JOIN r9 b ON b.id = a.id AND b.y = a.y AND b.x = a.x + 1
           |  WHERE a.x < 8 GROUP BY a.id)
           |SELECT id, ahash_hi, ahash_lo, dhash_hi, dhash_lo
           |FROM ah JOIN dh USING (id)""".stripMargin
      },

      // the banded Hamming join over dHash, planted variants included —
      // same closed-form pixel derivation, bands and bit_count in SQL
      "q89_phash_neardup" -> {
        def px(sx: String, sy: String) =
          s"(bid * 31 + ($sx) * 7 + ($sy) * 13 + (CASE WHEN ($sy) = 0 THEN delta ELSE 0 END)) % 256"
        s"""WITH imgs AS (
           |  SELECT doc_id AS id, doc_id AS bid, 0 AS delta,
           |      8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           |    FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 100000 AS id, doc_id AS bid, 60 AS delta,
           |      8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           |    FROM documents WHERE doc_id % 10 = 0),
           |px9 AS (SELECT id, bid, delta, w, h, unnest(generate_series(0, 71)) AS q FROM imgs),
           |r9 AS (SELECT id, q % 9 AS x, q // 9 AS y,
           |    ${px("((q % 9) * w) // 9", "((q // 9) * h) // 8")} AS v FROM px9),
           |dh AS (SELECT a.id,
           |  CAST(SUM(CASE WHEN b.v > a.v AND a.y * 8 + a.x >= 32 THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x - 32)) ELSE 0 END) AS BIGINT) AS hi,
           |  CAST(SUM(CASE WHEN b.v > a.v AND a.y * 8 + a.x < 32 THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x)) ELSE 0 END) AS BIGINT) AS lo
           |  FROM r9 a JOIN r9 b ON b.id = a.id AND b.y = a.y AND b.x = a.x + 1
           |  WHERE a.x < 8 GROUP BY a.id),
           |bands AS (
           |  SELECT id, hi, lo, 0 AS band, (hi // 65536) % 65536 AS band_val FROM dh
           |  UNION ALL SELECT id, hi, lo, 1, hi % 65536 FROM dh
           |  UNION ALL SELECT id, hi, lo, 2, (lo // 65536) % 65536 FROM dh
           |  UNION ALL SELECT id, hi, lo, 3, lo % 65536 FROM dh),
           |kept AS (SELECT id, hi, lo, band, band_val FROM (
           |  SELECT id, hi, lo, band, band_val,
           |    count(*) OVER (PARTITION BY band, band_val) AS bn FROM bands) WHERE bn <= 1000),
           |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |    a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
           |  FROM kept a JOIN kept b
           |  ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id)
           |SELECT id_a, id_b,
           |  CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
           |FROM cand
           |WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 8""".stripMargin
      },

      // the ingest-shape banded Hamming join: corpus and batch dHashes both
      // re-derived from the pixel closed form, corpus-side hot-band drop,
      // per-batch-row (hamming, cid) argmin, sentinel -1 for fresh rows
      "q95_image_ingest_dedup" -> {
        def px(sx: String, sy: String) =
          s"(bid * 31 + ($sx) * 7 + ($sy) * 13 + (CASE WHEN ($sy) = 0 THEN delta ELSE 0 END)) % 256"
        s"""WITH imgs AS (
           |  SELECT 'c' AS side, doc_id AS id, doc_id AS bid, 0 AS delta,
           |      8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           |    FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT 'b', doc_id + 100000, doc_id, 60, 8 + doc_id % 9, 8 + doc_id % 7
           |    FROM documents WHERE doc_id % 10 = 0
           |  UNION ALL
           |  SELECT 'b', doc_id, doc_id, 0, 8 + doc_id % 9, 8 + doc_id % 7
           |    FROM documents WHERE doc_id % 5 = 2),
           |px9 AS (SELECT side, id, bid, delta, w, h, unnest(generate_series(0, 71)) AS q FROM imgs),
           |r9 AS (SELECT side, id, q % 9 AS x, q // 9 AS y,
           |    ${px("((q % 9) * w) // 9", "((q // 9) * h) // 8")} AS v FROM px9),
           |dh AS (SELECT a.side, a.id,
           |  CAST(SUM(CASE WHEN b.v > a.v AND a.y * 8 + a.x >= 32 THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x - 32)) ELSE 0 END) AS BIGINT) AS hi,
           |  CAST(SUM(CASE WHEN b.v > a.v AND a.y * 8 + a.x < 32 THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x)) ELSE 0 END) AS BIGINT) AS lo
           |  FROM r9 a JOIN r9 b ON b.side = a.side AND b.id = a.id AND b.y = a.y AND b.x = a.x + 1
           |  WHERE a.x < 8 GROUP BY a.side, a.id),
           |cb AS (
           |  SELECT id, hi, lo, 0 AS band, (hi // 65536) % 65536 AS band_val FROM dh WHERE side = 'c'
           |  UNION ALL SELECT id, hi, lo, 1, hi % 65536 FROM dh WHERE side = 'c'
           |  UNION ALL SELECT id, hi, lo, 2, (lo // 65536) % 65536 FROM dh WHERE side = 'c'
           |  UNION ALL SELECT id, hi, lo, 3, lo % 65536 FROM dh WHERE side = 'c'),
           |kept AS (SELECT id, hi, lo, band, band_val FROM (
           |  SELECT id, hi, lo, band, band_val,
           |    count(*) OVER (PARTITION BY band, band_val) AS bn FROM cb) WHERE bn <= 1000),
           |bb AS (
           |  SELECT id, hi, lo, 0 AS band, (hi // 65536) % 65536 AS band_val FROM dh WHERE side = 'b'
           |  UNION ALL SELECT id, hi, lo, 1, hi % 65536 FROM dh WHERE side = 'b'
           |  UNION ALL SELECT id, hi, lo, 2, (lo // 65536) % 65536 FROM dh WHERE side = 'b'
           |  UNION ALL SELECT id, hi, lo, 3, lo % 65536 FROM dh WHERE side = 'b'),
           |m AS (SELECT id, cid, hamming FROM (
           |  SELECT b.id, c.id AS cid,
           |    CAST(bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)) AS BIGINT) AS hamming,
           |    row_number() OVER (PARTITION BY b.id
           |      ORDER BY bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)), c.id) AS rn
           |  FROM (SELECT DISTINCT id, hi, lo, band, band_val FROM bb) b
           |  JOIN kept c ON c.band = b.band AND c.band_val = b.band_val
           |  WHERE bit_count(xor(b.hi, c.hi)) + bit_count(xor(b.lo, c.lo)) <= 8) WHERE rn = 1),
           |batch_ids AS (SELECT DISTINCT id FROM dh WHERE side = 'b')
           |SELECT i.id,
           |  CASE WHEN m.cid IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status,
           |  COALESCE(m.cid, -1) AS dup_of, COALESCE(m.hamming, -1) AS hamming
           |FROM batch_ids i LEFT JOIN m ON m.id = i.id""".stripMargin
      },

      // per-frame integer features from the sample closed form — lag
      // window inside (id, frame) reproduces the in-frame sign changes
      "q90_audio_frames" ->
        """WITH wavs AS (SELECT doc_id AS id, 64 + doc_id % 33 AS n
          |  FROM documents WHERE doc_id % 7 = 0),
          |s AS (SELECT id, unnest(generate_series(0, n - 1)) AS i FROM wavs),
          |v AS (SELECT id, i // 16 AS frame_idx, i,
          |  (id * 37 + i * 101) % 4001 - 2000 AS samp FROM s),
          |w2 AS (SELECT id, frame_idx, samp,
          |  lag(samp) OVER (PARTITION BY id, frame_idx ORDER BY i) AS prev FROM v)
          |SELECT id, CAST(frame_idx AS BIGINT) AS frame_idx,
          |  CAST(COUNT(*) AS BIGINT) AS n_samples,
          |  CAST(SUM(samp * samp) AS BIGINT) AS energy,
          |  CAST(SUM(CASE WHEN prev IS NOT NULL AND
          |    ((prev < 0 AND samp >= 0) OR (prev >= 0 AND samp < 0))
          |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
          |  CAST(MAX(ABS(samp)) AS BIGINT) AS peak
          |FROM w2 GROUP BY id, frame_idx""".stripMargin,

      // the deterministic per-epoch shuffle re-derived from the same
      // md5-prefix hash (Horner chain over hex digits — exact integers)
      "q91_shard_assign" -> {
        val hv = md5PrefixValueSql("CAST(epoch AS VARCHAR) || '|' || CAST(id AS VARCHAR)", 15)
        s"""WITH e AS (SELECT doc_id AS id, unnest(generate_series(0, 1)) AS epoch FROM documents),
           |h AS (SELECT id, epoch, $hv AS hv FROM e)
           |SELECT id, CAST(epoch AS BIGINT) AS epoch, CAST(hv % 8 AS BIGINT) AS shard,
           |  CAST(row_number() OVER (PARTITION BY epoch, hv % 8 ORDER BY hv, id) - 1 AS BIGINT) AS shard_pos
           |FROM h""".stripMargin
      },

      "q92_datacard" ->
        s"""WITH d AS (SELECT source, lang, length(text) AS n_chars, md5(text) AS fp,
           |    ${tokenCountSql("text")} AS n_toks FROM documents)
           |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS distinct_texts,
           |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS dup_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           |  CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
           |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           |  quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS median_chars,
           |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
           |FROM d GROUP BY source, lang""".stripMargin,

      "q53_bloom_dedup" ->
        """WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 2),
          |newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 2
          |  UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM documents
          |    WHERE doc_id % 10 >= 2 AND doc_id % 50 = 7),
          |cfp AS (SELECT DISTINCT md5(lower(text)) AS fp FROM corp)
          |SELECT n.doc_id,
          |  CASE WHEN md5(lower(n.text)) IN (SELECT fp FROM cfp)
          |       THEN 'exact_dup' ELSE 'new' END AS status
          |FROM newd n""".stripMargin,

      "q49_mixture_weights" ->
        s"""WITH per AS (SELECT source, count(*) AS n_docs,
           |    CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  max(n_tokens) AS max_tokens FROM per)
           |SELECT source, n_docs, n_tokens,
           |  CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
           |  sqrt(CAST(n_tokens AS DOUBLE)) / sqrt(CAST(max_tokens AS DOUBLE)) AS rel_weight
           |FROM per, tot""".stripMargin,

      // link graph: identical anchor regex (group 1), host lowercase +
      // port strip, union-seeded host set, degree aggregates
      "q137_link_graph" ->
        s"""WITH crawl AS (SELECT doc_id, source AS host,
           |  '<html><body><a href="http://h' || CAST(doc_id % 7 AS VARCHAR) ||
           |  '.example/p' || CAST(doc_id AS VARCHAR) || '">x</a>' ||
           |  (CASE WHEN doc_id % 4 = 0 THEN '<a href="HTTPS://H' ||
           |     CAST(doc_id % 5 AS VARCHAR) || '.EXAMPLE:8080/y">u</a>' ELSE '' END) ||
           |  (CASE WHEN doc_id % 6 = 0 THEN '<a href="/local">rel</a>' ELSE '' END) ||
           |  text || '</body></html>' AS html FROM documents),
           |hrefs AS (SELECT host AS src,
           |    unnest(regexp_extract_all(html, '<a href="([^"]*)"', 1)) AS href
           |  FROM crawl),
           |tgt AS (SELECT src,
           |    lower(regexp_extract(href, '^[Hh][Tt][Tt][Pp][Ss]?://([^/:?#]*)', 1)) AS dst
           |  FROM hrefs),
           |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
           |  FROM tgt WHERE dst <> '' GROUP BY 1, 2),
           |outd AS (SELECT src AS host, CAST(sum(n) AS BIGINT) AS out_links,
           |    CAST(count(*) AS BIGINT) AS out_hosts FROM edges GROUP BY 1),
           |ind AS (SELECT dst AS host, CAST(sum(n) AS BIGINT) AS in_links,
           |    CAST(count(*) AS BIGINT) AS in_hosts FROM edges GROUP BY 1),
           |hosts AS (SELECT DISTINCT host FROM (
           |  SELECT host FROM crawl UNION ALL SELECT src FROM edges
           |  UNION ALL SELECT dst FROM edges))
           |SELECT h.host, coalesce(o.out_links, 0) AS out_links,
           |  coalesce(o.out_hosts, 0) AS out_hosts,
           |  coalesce(i.in_links, 0) AS in_links,
           |  coalesce(i.in_hosts, 0) AS in_hosts
           |FROM hosts h LEFT JOIN outd o USING (host) LEFT JOIN ind i USING (host)""".stripMargin,

      // anchor texts: the same two-group pattern extracted twice and
      // positionally zipped (list_zip ≡ arrays_zip), markup-bearing
      // anchors dropped by the shared [^<] bound
      "q139_anchor_texts" ->
        s"""WITH crawl AS (SELECT doc_id,
           |  '<html><body><a href="http://h' || CAST(doc_id % 7 AS VARCHAR) ||
           |  '.example/p">guide t' || CAST(doc_id % 11 AS VARCHAR) || '</a>' ||
           |  (CASE WHEN doc_id % 4 = 0 THEN '<a href="HTTPS://H' ||
           |     CAST(doc_id % 5 AS VARCHAR) || '.EXAMPLE:8080/y">ref <b>bold</b></a>'
           |   ELSE '' END) ||
           |  (CASE WHEN doc_id % 6 = 0 THEN '<a href="/rel">local</a>' ELSE '' END) ||
           |  text || '</body></html>' AS html FROM documents),
           |z AS (SELECT unnest(list_zip(
           |    regexp_extract_all(html, '<a href="([^"]*)">([^<]*)</a>', 1),
           |    regexp_extract_all(html, '<a href="([^"]*)">([^<]*)</a>', 2))) AS p
           |  FROM crawl),
           |pairs AS (SELECT
           |    lower(regexp_extract(struct_extract(p, 1),
           |      '^[Hh][Tt][Tt][Pp][Ss]?://([^/:?#]*)', 1)) AS dst,
           |    struct_extract(p, 2) AS anchor FROM z),
           |toks AS (SELECT dst, unnest(string_split(anchor, ' ')) AS tok
           |  FROM pairs WHERE dst <> '' AND anchor <> '')
           |SELECT dst, tok, CAST(count(*) AS BIGINT) AS n
           |FROM toks WHERE tok <> '' GROUP BY 1, 2""".stripMargin,

      // PageRank-lite: the SAME two iterations unrolled; every division
      // mirrors Spark's long/long shape (double divide, floor, BIGINT)
      "q138_host_rank" -> {
        // integer floor-division (//) mirrors Spark's DIV exactly on the
        // non-negative BIGINT ranks — no double intermediate, no 2^53 bound
        def step(rin: String, rout: String) =
          s"""c_$rout AS (SELECT e.dst AS host,
             |    CAST(sum(($rin.rank_fp * e.n) // ow.out_w) AS BIGINT) AS inbound
             |  FROM edges e JOIN $rin ON $rin.host = e.src
             |  JOIN outw ow ON ow.src = e.src GROUP BY 1),
             |$rout AS (SELECT h.host,
             |    CAST(150000 + (coalesce(c.inbound, 0) * 85) // 100 AS BIGINT) AS rank_fp
             |  FROM hosts h LEFT JOIN c_$rout c USING (host))""".stripMargin
        s"""WITH crawl AS (SELECT doc_id, source AS host,
           |  '<html><body><a href="http://h' || CAST(doc_id % 7 AS VARCHAR) ||
           |  '.example/p' || CAST(doc_id AS VARCHAR) || '">x</a>' ||
           |  (CASE WHEN doc_id % 4 = 0 THEN '<a href="HTTPS://H' ||
           |     CAST(doc_id % 5 AS VARCHAR) || '.EXAMPLE:8080/y">u</a>' ELSE '' END) ||
           |  text || '</body></html>' AS html FROM documents),
           |hrefs AS (SELECT host AS src,
           |    unnest(regexp_extract_all(html, '<a href="([^"]*)"', 1)) AS href
           |  FROM crawl),
           |tgt AS (SELECT src,
           |    lower(regexp_extract(href, '^[Hh][Tt][Tt][Pp][Ss]?://([^/:?#]*)', 1)) AS dst
           |  FROM hrefs),
           |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
           |  FROM tgt WHERE dst <> '' GROUP BY 1, 2),
           |outw AS (SELECT src, CAST(sum(n) AS BIGINT) AS out_w FROM edges GROUP BY 1),
           |hosts AS (SELECT DISTINCT host FROM (
           |  SELECT host FROM crawl UNION ALL SELECT src FROM edges
           |  UNION ALL SELECT dst FROM edges)),
           |r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS rank_fp FROM hosts),
           |${step("r0", "r1")},
           |${step("r1", "r2")}
           |SELECT host, rank_fp FROM r2""".stripMargin
      },

      // length quantiles: the same histogram inversion in SQL — smallest
      // length whose cumulative count covers q% (integer cross-multiply)
      "q136_length_quantiles" ->
        s"""WITH lens AS (SELECT source,
           |    least(${tokenCountSql("text")}, 4096) AS len FROM documents),
           |hist AS (SELECT source, CAST(len AS BIGINT) AS len,
           |    CAST(count(*) AS BIGINT) AS n FROM lens GROUP BY 1, 2),
           |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS t FROM hist GROUP BY 1),
           |cum AS (SELECT source, len, n,
           |    CAST(sum(n) OVER (PARTITION BY source ORDER BY len) AS BIGINT) AS cum
           |  FROM hist)
           |SELECT cum.source, max(tot.t) AS n_docs,
           |  min(CASE WHEN cum.cum * 100 >= tot.t * 50 THEN cum.len END) AS p50,
           |  min(CASE WHEN cum.cum * 100 >= tot.t * 90 THEN cum.len END) AS p90,
           |  min(CASE WHEN cum.cum * 100 >= tot.t * 99 THEN cum.len END) AS p99
           |FROM cum JOIN tot USING (source) GROUP BY 1""".stripMargin,

      // mojibake signatures: pure literal alternation (no classes, no
      // metachars) — Java regex and DuckDB RE2 count identically
      "q135_mojibake" -> {
        val pat = graft.functions.TextFunctions.MojibakePattern
        val chain = graft.functions.TextFunctions.MojibakePairs
          .foldLeft("text") { case (e, (bad, good)) => s"replace($e, '$bad', '$good')" }
        s"""WITH m AS (SELECT doc_id, text ||
           |  CASE WHEN doc_id % 3 = 0 THEN ' cafÃ© touchÃ©'
           |       WHEN doc_id % 3 = 1 THEN ' donâ€™t â€” Â© 2024'
           |       ELSE ' clean café' END AS text FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_moji,
           |  $chain AS text_fixed,
           |  CAST(len(regexp_extract_all(text, '$pat')) > 0 AS INT) AS is_moji,
           |  CAST(len(regexp_extract_all($chain, '$pat')) AS BIGINT) AS n_after
           |FROM m""".stripMargin
      },

      // CMS: per-seed bucket counts, probe every distinct token, min over
      // depth rows; md5 seeded 's<i>|' exactly as the Spark side
      "q133_cms_sketch" -> {
        val bkt = md5PrefixValueSql("concat('s', CAST(seed AS VARCHAR), '|', tok)", 8)
        s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
           |seeds AS (SELECT unnest(generate_series(0, 3)) AS seed),
           |tr AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_true FROM t GROUP BY 1),
           |sb AS (SELECT seed, ($bkt) % 64 AS bucket FROM t, seeds),
           |sk AS (SELECT seed, bucket, CAST(count(*) AS BIGINT) AS cnt
           |       FROM sb GROUP BY 1, 2),
           |pr AS (SELECT tok, seed, ($bkt) % 64 AS bucket
           |       FROM (SELECT DISTINCT tok FROM t), seeds),
           |est AS (SELECT pr.tok, min(sk.cnt) AS n_est
           |        FROM pr JOIN sk USING (seed, bucket) GROUP BY 1)
           |SELECT tr.tok, tr.n_true, est.n_est FROM tr JOIN est USING (tok)""".stripMargin
      },

      // T = 3/4 mixture: x^(3/4) = sqrt(x) * sqrt(sqrt(x)) — sqrt and
      // multiply are single correctly-rounded IEEE ops in both engines
      "q134_tempered_mixture" ->
        s"""WITH per AS (SELECT source, count(*) AS n_docs,
           |    CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  max(n_tokens) AS max_tokens FROM per)
           |SELECT source, n_docs, n_tokens,
           |  CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
           |  sqrt(CAST(n_tokens AS DOUBLE) / CAST(max_tokens AS DOUBLE)) *
           |    sqrt(sqrt(CAST(n_tokens AS DOUBLE) / CAST(max_tokens AS DOUBLE))) AS rel_weight
           |FROM per, tot""".stripMargin,

      "q52_source_overlap" ->
        s"""WITH ${shingleCte(3)},
           |sig AS (SELECT doc_id, ${(0 until 4).map(i => s"${minhashSql(i)} AS mh$i").mkString(", ")}
           |  FROM shingles GROUP BY doc_id),
           |banded AS (
           |  SELECT doc_id AS id, 0 AS band, concat_ws('|', mh0, mh1) AS band_val FROM sig
           |  UNION ALL
           |  SELECT doc_id AS id, 1 AS band, concat_ws('|', mh2, mh3) AS band_val FROM sig),
           |kept AS (SELECT id, band, band_val FROM (
           |  SELECT id, band, band_val, count(*) OVER (PARTITION BY band, band_val) AS bn
           |  FROM banded) WHERE bn <= 1000),
           |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
           |  FROM kept a JOIN kept b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id)
           |SELECT least(sa.source, sb.source) AS src_a,
           |  greatest(sa.source, sb.source) AS src_b, count(*) AS n_pairs
           |FROM pairs
           |JOIN documents sa ON sa.doc_id = pairs.id_a
           |JOIN documents sb ON sb.doc_id = pairs.id_b
           |GROUP BY 1, 2""".stripMargin,

      "q51_chunk_windows" ->
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |s AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 24)) AS start FROM t)
           |SELECT doc_id, CAST((start - 1) // 24 AS BIGINT) AS chunk_id,
           |  CAST(start AS BIGINT) AS start_tok,
           |  CAST(least(32, len(w) - start + 1) AS BIGINT) AS n_tokens,
           |  array_to_string(w[start:start+31], ' ') AS chunk_text
           |FROM s""".stripMargin,

      "q13_jaccard_pairs" ->
        s"""WITH ${shingleCte(3)},
           |shd AS (SELECT DISTINCT doc_id AS id, shingle FROM shingles),
           |sh AS (SELECT id, shingle FROM (
           |  SELECT id, shingle, count(*) OVER (PARTITION BY shingle) AS df
           |  FROM shd) WHERE df <= 5),
           |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
           |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
           |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2)
           |SELECT id_a, id_b,
           |  CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
           |FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
           |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2""".stripMargin,

      "q14_langid" ->
        s"SELECT doc_id, lang, ${langCase("text")} AS pred_lang FROM documents",

      "q15_quality" ->
        s"""SELECT doc_id, ${tokenCountSql("text")} AS n_tokens,
           |  $qualityExpr AS quality
           |FROM documents""".stripMargin,

      "q26_rolling_hash" -> {
        val hexIdx = (p: Int) => s"(strpos('0123456789abcdef', substring(md5(tok), $p, 1)) - 1)"
        val hv = s"CAST(((((${hexIdx(1)} * 16 + ${hexIdx(2)}) * 16 + ${hexIdx(3)}) * 16 + ${hexIdx(4)}) * 16 + ${hexIdx(5)}) AS BIGINT)"
        s"""SELECT doc_id, list_reduce(
           |  list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ' '), tok -> $hv)),
           |  (acc, h) -> (acc * ${TextFunctions.RollingHashMul} + h) % ${TextFunctions.RollingHashMod}) AS rhash
           |FROM documents""".stripMargin
      },

      "q27_clean_pipeline" ->
        s"""WITH kept AS (SELECT doc_id, text FROM documents WHERE $qualityExpr >= 0.55),
           |canon AS (SELECT doc_id, text,
           |  min(doc_id) OVER (PARTITION BY md5(lower(text))) AS cid FROM kept)
           |SELECT ${langCase("text")} AS pred_lang, count(*) AS n_docs
           |FROM canon WHERE doc_id = cid GROUP BY 1""".stripMargin,

      "q16_fingerprint" ->
        "SELECT doc_id, md5(lower(text)) AS fp FROM documents",

      "q21_event_window" ->
        """SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch, event_type,
          |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
          |  min(value) AS min_value, max(value) AS max_value
          |FROM events GROUP BY 1, 2""".stripMargin,

      "q22_lineitem_agg" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          |  sum(l_quantity) AS sum_qty,
          |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
          |  count(DISTINCT l_orderkey) AS n_orders
          |FROM lineitem GROUP BY 1, 2""".stripMargin,

      "q23_join_segment" ->
        """SELECT c_mktsegment, count(*) AS n_orders, max(o_totalprice) AS max_price
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |WHERE o_orderstatus = 'F' GROUP BY 1""".stripMargin,

      "q24_media_meta" ->
        """SELECT doc_id AS id,
          |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS fp,
          |  (CAST(octet_length(encode(text)) AS BIGINT) + 15) // 16 AS n_frames
          |FROM documents""".stripMargin,

      "q25_frame_sample" ->
        """SELECT doc_id AS id,
          |  ((CAST(octet_length(encode(text)) AS BIGINT) + 15) // 16 + 1) // 2 AS n_sampled,
          |  substring(hex(encode(text)), 1, 32) AS first_frame_hex
          |FROM documents""".stripMargin,

      "q28_bpe_tokens" ->
        s"SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '${TextFunctions.BpePattern}')) AS BIGINT) AS n_bpe FROM documents",

      "q29_sessionize" ->
        """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
          |gaps AS (SELECT user_id, event_id, t,
          |  CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 600000000
          |       THEN 1 ELSE 0 END AS brk FROM e),
          |sess AS (SELECT user_id, t,
          |  sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM gaps)
          |SELECT user_id, CAST(sid AS BIGINT) AS sid, min(t) AS session_start_us,
          |  count(*) AS n_events
          |FROM sess GROUP BY 1, 2""".stripMargin,

      "q30_json_extract" ->
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50""".stripMargin,

      "q31_normalize" -> {
        val n = s"sqrt(${dotSql("embedding", "embedding", EmbDim)})"
        // scalar + unnest in a CTE (DuckDB 1.0 rejects lateral column args
        // to the table-fn generate_series); i is 1-based like element_at
        s"""WITH idx AS (SELECT vec_id, embedding,
           |  unnest(generate_series(1, len(embedding))) AS i FROM embeddings)
           |SELECT vec_id AS id, CAST(i - 1 AS INT) AS pos,
           |  CASE WHEN $n = 0.0 THEN CAST(embedding[i] AS DOUBLE)
           |       ELSE CAST(embedding[i] AS DOUBLE) / $n END AS component
           |FROM idx""".stripMargin
      },

      "q37_salted_count" ->
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1",

      "q38_rollup" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          |  sum(l_quantity) AS sum_qty, max(l_extendedprice) AS max_price
          |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

      "q35_range_join" ->
        """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type FROM events),
          |p AS (SELECT user_id, event_id AS p_event, t AS pt FROM e WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, event_id AS c_event, t AS ct FROM e WHERE event_type = 'click')
          |SELECT p.p_event, c.c_event, c.ct - p.pt AS dt
          |FROM p JOIN c ON p.user_id = c.user_id
          |  AND c.ct >= p.pt AND c.ct <= p.pt + 3600000000""".stripMargin,

      "q34_quantize" ->
        """WITH idx AS (SELECT vec_id, embedding,
          |  unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
          |e AS (SELECT vec_id, CAST(i - 1 AS INT) AS pos,
          |  CAST(embedding[i] AS DOUBLE) AS x FROM idx),
          |r AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM e GROUP BY pos)
          |SELECT e.vec_id AS id, e.pos,
          |  CAST(CASE WHEN hi = lo THEN 0
          |            ELSE floor((x - lo) / (hi - lo) * 255.0) END AS BIGINT) AS code
          |FROM e JOIN r USING (pos)""".stripMargin,

      "q32_asof_join" ->
        """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type FROM events),
          |c AS (SELECT user_id, event_id, t FROM e WHERE event_type = 'click'),
          |p AS (SELECT user_id, t FROM e WHERE event_type = 'purchase')
          |SELECT c.event_id, c.user_id, c.t, p.t AS last_purchase_t
          |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t >= p.t""".stripMargin,

      "q18_ivf_assign" ->
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 10),
           |scored AS (SELECT e.vec_id AS id, c.cid, ${l2Sql("e.embedding", "c.ce", EmbDim)} AS dist
           |  FROM embeddings e, c),
           |r AS (SELECT id, cid, dist,
           |  row_number() OVER (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn FROM scored)
           |SELECT id, cid, dist FROM r WHERE rn = 1""".stripMargin,

      "q93_kmeans_exact" ->
        s"""WITH ${kmeansCtes(k = 8, iters = 2, dim = EmbDim)},
           |$kmeansAssignSql
           |SELECT id, cid, dist FROM fr""".stripMargin,

      "q94_cluster_card" ->
        s"""WITH ${kmeansCtes(k = 8, iters = 2, dim = EmbDim)},
           |$kmeansAssignSql
           |SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
           |  CAST(SUM(dist) AS BIGINT) AS inertia,
           |  CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
           |FROM fr GROUP BY cid""".stripMargin,

      "q19_ivf_search" ->
        s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 10),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
           |cscored AS (SELECT q.qid, c.cid, ${l2Sql("q.qe", "c.ce", EmbDim)} AS cdist FROM q, c),
           |probed AS (SELECT qid, cid FROM (
           |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cdist ASC, cid ASC) AS cr
           |  FROM cscored) WHERE cr <= 3),
           |ascored AS (SELECT e.vec_id AS id, c.cid, ${l2Sql("e.embedding", "c.ce", EmbDim)} AS dist
           |  FROM embeddings e, c),
           |assigned AS (SELECT id, cid FROM (
           |  SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
           |  FROM ascored) WHERE rn = 1),
           |cand AS (SELECT p.qid, a.id, ${l2Sql("e.embedding", "q.qe", EmbDim)} AS dist
           |  FROM probed p JOIN assigned a ON a.cid = p.cid
           |  JOIN embeddings e ON e.vec_id = a.id JOIN q ON q.qid = p.qid)
           |SELECT qid, "rank", id, dist FROM (
           |  SELECT qid, id, dist,
           |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS INT) AS "rank"
           |  FROM cand) WHERE "rank" <= 5""".stripMargin,

      "q20_simhash" -> {
        val hexIdx = (p: Int) => s"(strpos('0123456789abcdef', substring(md5(tok), $p, 1)) - 1)"
        val hv = s"${hexIdx(1)} * 4096 + ${hexIdx(2)} * 256 + ${hexIdx(3)} * 16 + ${hexIdx(4)}"
        val votes = (0 until 16).map(j =>
          s"sum(CASE WHEN (v >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(", ")
        val sig = (0 until 16).map(j =>
          s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
        s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |hv AS (SELECT doc_id, $hv AS v FROM toks),
           |votes AS (SELECT doc_id, $votes FROM hv GROUP BY doc_id)
           |SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM votes""".stripMargin
      },

      "q17_embed_neardup" -> {
        val d = cosineSql("a.embedding", "b.embedding", EmbDim)
        s"""WITH kept AS (SELECT vec_id, embedding, label FROM (
           |  SELECT vec_id, embedding, label, count(*) OVER (PARTITION BY label) AS bn
           |  FROM embeddings) WHERE bn <= 1000)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $d AS dist
           |FROM kept a JOIN kept b ON a.label = b.label AND a.vec_id < b.vec_id
           |WHERE $d < 0.65""".stripMargin
      },

      "q33_embed_neardup_lsh" -> {
        val d = cosineSql("a.embedding", "b.embedding", EmbDim)
        s"""WITH bk AS (SELECT vec_id, embedding,
           |  ${embeddingBucketSql("embedding", EmbDim, 8)} AS bucket FROM embeddings),
           |kept AS (SELECT vec_id, embedding, bucket FROM (
           |  SELECT vec_id, embedding, bucket, count(*) OVER (PARTITION BY bucket) AS bn
           |  FROM bk) WHERE bn <= 1000)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $d AS dist
           |FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE $d < 0.65""".stripMargin
      },

      // q33's bucket CTE in cross-corpus (ingest) form: corpus-hot blocks
      // pruned from both sides, per-new-id count + min(dist) — exact
      "q78_incremental_semdedup" -> {
        val d = cosineSql("nk.ne", "ck.ce", EmbDim)
        s"""WITH bk AS (SELECT vec_id, embedding,
           |  ${embeddingBucketSql("embedding", EmbDim, 8)} AS blk FROM embeddings),
           |c AS (SELECT vec_id AS cid, embedding AS ce, blk FROM bk WHERE vec_id % 10 >= 2),
           |n AS (SELECT vec_id AS id, embedding AS ne, blk FROM bk WHERE vec_id % 10 < 2),
           |hot AS (SELECT blk FROM c GROUP BY blk HAVING count(*) > 1000),
           |ck AS (SELECT * FROM c WHERE blk NOT IN (SELECT blk FROM hot)),
           |nk AS (SELECT * FROM n WHERE blk NOT IN (SELECT blk FROM hot)),
           |near AS (SELECT id, count(*) AS n_near, min(d) AS best_dist FROM (
           |  SELECT nk.id, $d AS d FROM nk JOIN ck ON nk.blk = ck.blk
           |  WHERE $d < 0.65) GROUP BY id)
           |SELECT b.vec_id, coalesce(near.n_near, 0) AS n_near, near.best_dist,
           |  CASE WHEN near.id IS NULL THEN 'new' ELSE 'semantic_dup' END AS status
           |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 < 2) b
           |LEFT JOIN near ON b.vec_id = near.id""".stripMargin
      },

      // q78's blocked-proximity CTE with the q95 argmin: per-train-row
      // best (dist, bench id) under a row_number the engine's struct-min
      // reproduces without a window
      "q98_semantic_decontam" -> {
        val d = cosineSql("tk.te", "bkk.be", EmbDim)
        s"""WITH bk AS (SELECT vec_id, embedding,
           |  ${embeddingBucketSql("embedding", EmbDim, 8)} AS blk FROM embeddings),
           |b AS (SELECT vec_id AS bid, embedding AS be, blk FROM bk WHERE vec_id % 7 = 3),
           |t AS (SELECT vec_id AS id, embedding AS te, blk FROM bk WHERE vec_id % 7 <> 3),
           |hot AS (SELECT blk FROM b GROUP BY blk HAVING count(*) > 1000),
           |bkk AS (SELECT * FROM b WHERE blk NOT IN (SELECT blk FROM hot)),
           |tk AS (SELECT * FROM t WHERE blk NOT IN (SELECT blk FROM hot)),
           |m AS (SELECT id, bid, d AS best_dist FROM (
           |  SELECT tk.id, bkk.bid, $d AS d,
           |    row_number() OVER (PARTITION BY tk.id ORDER BY $d, bkk.bid) AS rn
           |  FROM tk JOIN bkk ON tk.blk = bkk.blk WHERE $d < 0.65) WHERE rn = 1)
           |SELECT tt.vec_id,
           |  CASE WHEN m.bid IS NOT NULL THEN 'contaminated' ELSE 'clean' END AS status,
           |  COALESCE(m.bid, -1) AS bench_id, m.best_dist
           |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 3) tt
           |LEFT JOIN m ON m.id = tt.vec_id""".stripMargin
      },

      // q33's pair CTE + q36's recursive component CTE + the verdict
      "q74_semantic_dedup" -> {
        val d = cosineSql("a.embedding", "b.embedding", EmbDim)
        s"""WITH RECURSIVE bk AS (SELECT vec_id, embedding,
           |  ${embeddingBucketSql("embedding", EmbDim, 8)} AS bucket FROM embeddings),
           |kept AS (SELECT vec_id, embedding, bucket FROM (
           |  SELECT vec_id, embedding, bucket, count(*) OVER (PARTITION BY bucket) AS bn
           |  FROM bk) WHERE bn <= 1000),
           |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |  WHERE $d < 0.65),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach AS (
           |  SELECT vec_id AS id, vec_id AS comp FROM embeddings
           |  UNION
           |  SELECT e.src AS id, r.comp FROM edges e JOIN reach r ON r.id = e.dst),
           |sel AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
           |SELECT id AS vec_id, comp AS canonical_id, id <> comp AS is_dup
           |FROM sel""".stripMargin
      },
    )
  }
}
