package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for data-mixing quotas — the step that turns a
  * cleaned corpus into a training mixture ("50% of the English, 20% of
  * everything else…").
  *
  * `rand()`-based sampling is nondeterministic across retries and
  * partitionings; hash-rate sampling keys the decision on the row id:
  * keep iff `h(id) mod 100 < rate`, with h = the integer value of the
  * first 8 md5 hex chars of the id — reproducible on any cluster, any
  * partitioning, any engine (md5 + integer arithmetic only, so a DuckDB
  * oracle replays the exact sample).
  *
  * Hash width and rate bias: a w-bit hash leaves each rate with an
  * absolute bias of at most (2^w mod 100)/2^w. The 32-bit hash used here
  * bounds it at ~2.3e-8 (a 16-bit hash would be ~5e-4 — visible in quota
  * accounting at billions of rows).
  */
object Sampling {

  /** 32-bit md5-based hash of the (stringified) id column. */
  def idHash(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep rows where hash(id) mod 100 < ratePct. `ratePct` may be a per-row
    * expression (stratified quotas) or a literal.
    */
  def hashSample(df: DataFrame, idCol: String, ratePct: Column): DataFrame =
    df.filter(pmod(idHash(col(idCol)), lit(100L)) < ratePct)

  /** Per-source corpus composition with temperature-0.5 sampling weights —
    * the mixture table a training run is configured from: n_docs, n_tokens,
    * exact token share, and `rel_weight` = √(n_tokens_s) / √(max_s n_tokens)
    * (∝ share^T with T = 0.5 — the standard square-root temperature that
    * up-weights small sources without letting them dominate).
    *
    * `rel_weight` is deliberately relative-to-the-largest-source rather
    * than normalized to Σ = 1: normalizing needs a sum of per-source
    * square roots — an order-dependent double sum the bit-exact oracle
    * contract excludes. All columns here are integer aggregates plus
    * single exact ops (÷, sqrt), so a DuckDB oracle reproduces them
    * bit-for-bit at any parallelism. For probabilities, see
    * [[mixtureWeightsNormalized]].
    *
    * Scale shape: one partial-agg groupBy over the corpus (token counts
    * computed without materializing token arrays), one single-row scalar
    * aggregate broadcast back.
    */
  def mixtureWeights(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val per = docs.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"), max(col("n_tokens")).as("max_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double")).as("token_share"),
        (sqrt(col("n_tokens").cast("double")) / sqrt(col("max_tokens").cast("double")))
          .as("rel_weight"))
  }

  /** [[mixtureWeights]] plus `weight` = rel_weight / Σ_s rel_weight — true
    * sampling probabilities (Σ weight = 1). The denominator is a sum of
    * doubles, folded in SORTED source order over a collected array
    * (`aggregate(array_sort(collect_list(...)))`) so the association order
    * is fixed and the result is deterministic at any parallelism — but it
    * is a cross-engine reassociation hazard, which is why this variant is
    * spec-tested rather than oracle-checked. The source list is one row per
    * source (thousands at most) — driver-safe by construction.
    */
  /** Leakage-safe train/validation split: the split decision hashes the
    * DUP-CLUSTER label ([[Dedup.dupClusters]] `comp`), not the document id,
    * so near-duplicates can never straddle the boundary — the standard
    * eval-contamination bug where a paraphrase of a validation doc sits in
    * train. Every member of a cluster lands in the same split; singleton
    * docs (their own cluster) split independently, so the realized
    * validation fraction stays ≈ validPct on a mostly-unique corpus.
    *
    * Same determinism contract as [[hashSample]]: md5-derived 32-bit hash
    * mod 100, reproducible on any cluster/partitioning/engine. Scale
    * shape: a pure projection over the cluster-label table — no shuffle
    * of its own. Output: (idCol, comp, split ∈ train|valid).
    */
  def leakageSafeSplit(clusters: DataFrame, idCol: String, validPct: Int): DataFrame =
    clusters.select(col(idCol), col("comp"))
      .withColumn("split",
        when(pmod(idHash(col("comp")), lit(100L)) < validPct, lit("valid"))
          .otherwise(lit("train")))

  /** Hashed n-gram domain-affinity score for targeted data selection — the
    * importance signal behind DSIR-style mixture curation, kept
    * log-ratio-free so it stays oracle-exact: a document scores the
    * fraction of its DISTINCT hashed word-n-gram buckets that also occur
    * in a TARGET corpus (the domain to select for). Integer counts + one
    * exact division; selection then filters or quota-samples on the score
    * (compose with [[sampleByRate]]).
    *
    * Scale shape: the target side collapses to its distinct bucket set —
    * at MOST `buckets` rows no matter how large the target corpus is, so
    * it broadcasts at any scale; the doc side is one explode + distinct +
    * broadcast-join + count partial-agg, shuffle O(doc-bucket pairs),
    * never doc×target. Docs too short for any shingle score 0.0.
    * Out: (idCol, n_buckets, n_target, domain_score).
    */
  def domainScore(docs: DataFrame, target: DataFrame, idCol: String, textCol: String,
                  n: Int = 2, buckets: Int = 1 << 16): DataFrame = {
    import graft.functions.TextFunctions
    def bucketOf(sh: Column): Column =
      pmod(conv(substring(md5(sh), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))
    def bucketSet(df: DataFrame, keep: Column*): DataFrame = df
      .select(keep :+ TextFunctions.tokens(col(textCol)).as("w"): _*)
      .select(keep :+ explode(TextFunctions.wordShinglesFromTokens(col("w"), n)).as("sh"): _*)
      .select(keep :+ bucketOf(col("sh")).as("b"): _*)
      .distinct()
    val docBuckets = bucketSet(docs, col(idCol))
    val targetBuckets = bucketSet(target).withColumn("__t", lit(true))
    val counts = docBuckets.join(broadcast(targetBuckets), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_buckets"),
        count(col("__t")).as("n_target"))
    docs.select(col(idCol)).distinct()
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_buckets"), lit(0L)).as("n_buckets"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        when(coalesce(col("n_buckets"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("n_target"), lit(0L)).cast("double") /
            coalesce(col("n_buckets"), lit(1L)).cast("double")).as("domain_score"))
  }

  /** Per-domain document cap: keep the top `n` documents of every domain
    * by score (quality, LM fluency, …) — the standard anti-domination
    * pass of web-corpus prep (one crawl-heavy host must not become the
    * mixture; caps are per-DOMAIN, so the decision is local to each
    * domain's own ranking, ties broken by lowest id).
    *
    * Scale shape: one `groupBy(domain)` into the bounded-heap
    * [[org.apache.spark.sql.graft.TopKAggregate]] — every aggregation
    * buffer holds ≤ n entries at every partial stage, so a
    * million-document domain costs the same buffer as a ten-document one
    * and the shuffle carries O(domains × n) rows, NOT a per-domain sort.
    * The window form (`row_number() over (partition by domain)`) would
    * put the hottest domain's full row set in one task — exactly the
    * degenerate case the cap exists for; it stays the ORACLE's job only.
    *
    * Score negation is exact (0.0 − x, IEEE), so the reported score is
    * bit-identical to the input. Output: (domainCol, rank, idCol,
    * scoreCol), rank 1-based by (score desc, id asc).
    */
  def perDomainCap(scored: DataFrame, idCol: String, domainCol: String,
                   scoreCol: String, n: Int): DataFrame =
    scored.select(col(domainCol), col(idCol).cast("long").as("__id"),
        col(scoreCol).cast("double").as("__score"))
      .groupBy(col(domainCol))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(
        lit(0.0) - col("__score"), col("__id"), n).as("top"))
      .select(col(domainCol), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(domainCol), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as(idCol),
        (lit(0.0) - col("entry.dist")).as(scoreCol))

  /** Token-budget quota fill: per source, keep best-quality documents
    * until `quota` training tokens are selected — the mixture-execution
    * step that turns per-source token budgets into an actual document
    * selection.
    *
    * Scale shape — selection WITHOUT a per-source sort: a per-source
    * quality sort (or `row_number` window over docs) would stream a
    * billion-doc web source through one ordering. Instead quality is
    * histogrammed into `bins` integer buckets (floor(q·bins) — one IEEE
    * multiply on the exact quality score, deterministic in both engines):
    *
    *   1. per-(source, bin) token totals — a partial agg over ≤
    *      sources × (bins+1) rows;
    *   2. running totals over bins, best-first — a window PARTITIONED by
    *      source over ≤ bins+1 rows per task (never the doc stream);
    *   3. a bin is kept iff the strictly-better bins left quota room
    *      (`cum − bin_tok < quota`), so overshoot is bounded by ONE
    *      bin's tokens;
    *   4. verdicts broadcast back to the doc stream by (source, bin)
    *      equi-join.
    *
    * Same discipline as [[graft.operators.Retrieval.perplexityBuckets]]:
    * whole bins share a fate, which is what makes the decision
    * histogram-sized instead of corpus-sized.
    *
    * Output: (sourceCol, idCol, n_tok, bin, keep) — keep ∈ {0, 1}. Every
    * input row with a non-NULL source and text is present; NULL-text or
    * NULL-source rows are excluded (a NULL quality has no bin, and the
    * (source, bin) equi-join is deliberately null-rejecting — the same
    * verdict a SQL oracle's inner join produces).
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, sourceCol: String,
                        textCol: String, quota: Long,
                        bins: Int = 1000): DataFrame = {
    import graft.functions.TextFunctions
    val scored = docs.select(col(sourceCol), col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
      floor(TextFunctions.qualityScore(col(textCol)) * bins).cast("long").as("bin"))
    val w = Window.partitionBy(sourceCol).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val verdicts = scored.groupBy(col(sourceCol), col("bin"))
      .agg(sum(col("n_tok")).as("bin_tok"))
      .withColumn("cum_tok", sum(col("bin_tok")).over(w))
      .withColumn("keep", (col("cum_tok") - col("bin_tok") < quota).cast("int"))
      .select(col(sourceCol), col("bin"), col("keep"))
    // no broadcast HINT: verdicts is sources × (bins+1) rows — small for
    // curated source lists, but a per-DOMAIN source column in a crawl has
    // millions of keys; AQE's size-based choice handles both
    scored.join(verdicts, Seq(sourceCol, "bin"))
      .select(col(sourceCol), col(idCol), col("n_tok"), col("bin"), col("keep"))
  }

  /** Deterministic in-batch negative sampling — the contrastive-training
    * data op: items hash into fixed batches, and each anchor draws up to
    * `k` DIFFERENT-label negatives from its OWN batch, ranked by a pair
    * hash (md5 of "anchor|candidate") so the draw is pseudo-random yet a
    * pure function of the ids — reproducible across retries, engines and
    * partitionings, like every sampling decision in this module.
    *
    * Scale shape: the candidate join is WITHIN-batch only (the in-batch
    * negative convention — pairs are O(n · batch), never n²); per-anchor
    * selection rides the bounded heap
    * ([[org.apache.spark.sql.graft.TopKAggregate]] on the 48-bit pair
    * hash — exact in the heap's double domain), so no per-anchor sort
    * exists. Anchors whose batch offers fewer than k cross-label
    * candidates emit fewer rows; all-same-label batches emit none.
    *
    * Output: (anchor, rank, neg_id), rank 1-based in pair-hash order.
    */
  def inBatchNegatives(items: DataFrame, idCol: String, labelCol: String,
                       numBatches: Int = 256, k: Int = 3): DataFrame = {
    require(numBatches > 0 && k > 0, "inBatchNegatives: positive numBatches and k")
    val hashed = items.select(col(idCol).cast("long").as("id"), col(labelCol).as("label"))
      .withColumn("batch", pmod(
        conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long"),
        lit(numBatches.toLong)))
    val a = hashed.select(col("batch"), col("id").as("anchor"), col("label").as("albl"))
    val b = hashed.select(col("batch"), col("id").as("cand"), col("label").as("clbl"))
    a.join(b, "batch")
      .filter(col("anchor") =!= col("cand") && col("albl") =!= col("clbl"))
      .withColumn("h", conv(substring(md5(concat(col("anchor").cast("string"),
        lit("|"), col("cand").cast("string"))), 1, 12), 16, 10).cast("long"))
      .groupBy(col("anchor"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(
        col("h").cast("double"), col("cand"), k).as("top"))
      .select(col("anchor"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("anchor"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("neg_id"))
  }

  /** Mixture EXECUTION by epoch upsampling — materialize the training
    * mixture a weights table only describes: every source contributes
    * `targetTokens` training tokens by repeating its documents
    * ⌊target / T_s⌋ whole epochs (T_s = the source's token total, the
    * division exact integer DIV), capped at `maxEpochs` (the standard
    * repetition guard — tokens repeated past a few epochs degrade
    * models faster than they help), plus ONE fractional epoch holding a
    * hash-selected subset that fills the remainder. Sources larger than
    * the target get `full = 0` and only the fractional epoch — the same
    * rule downsamples giants and upsamples minnows.
    *
    * The fractional subset uses the [[tokenBudgetSelect]] bin
    * discipline, keyed on the id-hash instead of quality: docs land in
    * `bins` hash buckets, per-(source, bin) token totals cum-sum over a
    * window of ≤ `bins` rows per source (never the doc stream), and a
    * bin is in iff the bins before it left room (`cum − bin_tok <
    * rem`) — overshoot bounded by one bin's tokens, selection a pure
    * function of ids (reproducible on any cluster/partitioning/engine,
    * like every decision in this module; rem < T_s by construction, so
    * the fractional epoch is always a proper prefix).
    *
    * Scale shape: one partial-agg groupBy for totals (joined back
    * size-based by AQE — source cardinality may be crawl-sized), one
    * bounded window, one `explode(sequence(1, full))` whose fan-out is
    * capped at `maxEpochs` × corpus by construction. Zero-token sources
    * contribute nothing. Output: (idCol, sourceCol, n_tok, epoch) —
    * epoch ∈ 1..full for whole epochs, full+1 for the fractional one.
    */
  def epochUpsample(docs: DataFrame, idCol: String, sourceCol: String,
                    textCol: String, targetTokens: Long, maxEpochs: Int,
                    bins: Int = 1000): DataFrame = {
    require(targetTokens > 0 && maxEpochs > 0 && bins > 0,
      "epochUpsample: positive targetTokens, maxEpochs, bins")
    import graft.functions.TextFunctions
    val toks = docs.select(col(idCol), col(sourceCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
      pmod(idHash(col(idCol)), lit(bins.toLong)).as("bin"))
    val quotas = toks.groupBy(col(sourceCol))
      .agg(sum(col("n_tok")).as("t"))
      .filter(col("t") > 0)
      .withColumn("full", least(lit(maxEpochs.toLong), expr(s"$targetTokens DIV t")))
      .withColumn("rem", when(col("full") < maxEpochs,
        lit(targetTokens) - col("full") * col("t")).otherwise(lit(0L)))
    val w = Window.partitionBy(sourceCol).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fracBins = toks.groupBy(col(sourceCol), col("bin"))
      .agg(sum(col("n_tok")).as("bin_tok"))
      .withColumn("cum_tok", sum(col("bin_tok")).over(w))
      .select(col(sourceCol), col("bin"), (col("cum_tok") - col("bin_tok")).as("before_tok"))
    val joined = toks.join(quotas, Seq(sourceCol))
    val wholeEpochs = joined.filter(col("full") >= 1)
      .select(col(idCol), col(sourceCol), col("n_tok"),
        explode(sequence(lit(1L), col("full"))).as("epoch"))
    val fractional = joined.filter(col("rem") > 0)
      .join(fracBins, Seq(sourceCol, "bin"))
      .filter(col("before_tok") < col("rem"))
      .select(col(idCol), col(sourceCol), col("n_tok"), (col("full") + 1).as("epoch"))
    wholeEpochs.unionAll(fractional)
  }

  /** Diversity-capped (cluster-balanced) sampling over an embedding
    * column — the coreset step of embedding-aware curation: cap every
    * region of embedding space at `capPerBucket` vectors so dense blobs
    * (templated boilerplate, one crawl's house style) cannot dominate
    * the sample, while sparse regions survive whole. Regions are
    * [[Dedup.embeddingBucket]]'s deterministic sign-LSH cells (no
    * trained model, any engine reproduces them); within a bucket the
    * survivors are drawn in id-hash order (pseudo-random yet a pure
    * function of the ids, like every decision in this module).
    *
    * Scale shape: one `groupBy(bucket)` into the bounded-heap
    * [[org.apache.spark.sql.graft.TopKAggregate]] — per-buffer state is
    * ≤ cap entries at every partial stage, the shuffle carries
    * O(buckets × cap) rows, and no per-bucket sort or window ever sees
    * the full vector stream (the window form stays the ORACLE's job).
    * The 32-bit id hash is exact in the heap's double domain; ties
    * break by lowest id. Output: (bucket, rank, idCol), rank 1-based
    * in hash order.
    */
  def diversitySample(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                      capPerBucket: Int, bits: Int = 8): DataFrame = {
    require(capPerBucket > 0, "diversitySample: positive capPerBucket")
    emb.select(col(idCol).cast("long").as("__id"),
        Dedup.embeddingBucket(col(vecCol), dim, bits).as("bucket"),
        idHash(col(idCol)).cast("double").as("__h"))
      .groupBy(col("bucket"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(
        col("__h"), col("__id"), capPerBucket).as("top"))
      .select(col("bucket"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("bucket"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as(idCol))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public): per-document
    * log importance weight log(p_target(doc)/p_raw(doc)) under hashed
    * n-gram unigram models of a small TARGET corpus (the distribution you
    * want more of) and the RAW corpus being selected from. Where
    * [[domainScore]] measures bucket-set containment (what fraction of a
    * doc's shingles the target has seen at all), this is the canonical
    * importance-sampling estimate: buckets the target uses MORE often
    * than the raw corpus pull a document up, buckets it uses less push it
    * down, occurrence counts weighted, not just presence.
    *
    * Cross-engine exactness: profiles are integer occurrence counts; the
    * per-bucket weight `ln(p̂_t(b)/p̂_r(b))` with add-one smoothing over
    * the B-bucket vocabulary is fixed-pointed ONCE per distinct bucket —
    * `floor(ln((cnt_t+1)·(rtot+B) / ((cnt_r+1)·(ttot+B)))·1e6 + 0.5)`
    * micro-nats, BIGINT (both products are integer-exact in the double
    * domain below 2^53; one correctly-rounded division; the engine's
    * accepted ln posture) — so document scores are order-independent
    * integer sums at any parallelism.
    *
    * Scale shape (100 TB): both profiles partial-aggregate to ≤ B rows
    * (map-side combine; B = 2^16 default), totals are 1-row broadcasts,
    * the weight table is ≤ B rows broadcast onto the doc-bucket stream —
    * the raw corpus is read once, nothing corpus-sized shuffles except
    * the per-(doc, bucket) counts that scoring inherently needs. Buckets
    * the raw corpus never emits cannot appear in any scored document, so
    * the weight table only carries raw-profile buckets (target-only
    * buckets would matter to a perplexity bound, not to scoring).
    *
    * Output: (idCol, n_grams, dsir_fp) — one row per distinct raw doc id;
    * docs too short for any n-gram score (0, 0).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
                  n: Int = 2, buckets: Int = 1 << 16): DataFrame = {
    import graft.functions.TextFunctions
    val b = buckets.toLong
    def grams(df: DataFrame, keep: Column*): DataFrame = df
      .select(keep :+ TextFunctions.tokens(col(textCol)).as("w"): _*)
      .select(keep :+ explode(TextFunctions.wordShinglesFromTokens(col("w"), n)).as("sh"): _*)
      .select(keep :+ pmod(conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long"), lit(b))
        .as("b"): _*)
    val rawGrams = grams(raw, col(idCol))
    // two-level aggregation (r16, guide §2.5): the corpus profile is the
    // bucket-sum of the per-(doc, bucket) counts the scoring branch needs
    // anyway, so both consumers share ONE explode+hash pass under the
    // (id, b) exchange (AQE reuses the materialized stage) instead of re-exploding the raw
    // corpus twice. Identical counts by associativity of count/sum.
    val rawDocB = rawGrams.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n_b"))
    val rawProfile = rawDocB.groupBy(col("b")).agg(sum(col("n_b")).as("cnt_r"))
    val targetProfile = grams(target).groupBy(col("b")).agg(count(lit(1)).as("cnt_t"))
    val totals = rawProfile.agg(sum("cnt_r").as("rtot"))
      .crossJoin(targetProfile.agg(sum("cnt_t").as("ttot")))
    val weights = rawProfile.join(targetProfile, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor(log(
          ((coalesce(col("cnt_t"), lit(0L)) + lit(1L)) * (col("rtot") + lit(b))).cast("double") /
            ((col("cnt_r") + lit(1L)) * (col("ttot") + lit(b))).cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("w_fp"))
    val perDoc = rawDocB
      .join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(sum(col("n_b")).as("n_grams"), sum(col("n_b") * col("w_fp")).as("dsir_fp"))
    raw.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_fp"), lit(0L)).as("dsir_fp"))
  }

  /** Count-quota selection over an integer score — the resampling half of
    * DSIR (deterministic variant: highest-weight documents first instead
    * of Gumbel noise, so the selection is a pure function of the corpus),
    * reusable over any fixed-point score column.
    *
    * Scale shape — selection WITHOUT a global sort (the
    * [[tokenBudgetSelect]] discipline, globalized): scores are binned by
    * exact integer arithmetic onto a [min, max] grid (2-row broadcast for
    * the range; `step = max(⌈range/bins⌉, 1)`), per-bin doc counts
    * partial-aggregate to ≤ bins+1 rows, a running count best-bin-first
    * over that bounded table decides which WHOLE bins fit the quota
    * (`cum − n_bin < quota` — overshoot bounded by one bin's population),
    * and verdicts broadcast back by bin equi-join. The doc stream is
    * never sorted and never windowed.
    *
    * Output: (idCol, scoreCol, bin, keep) — keep ∈ {0, 1}, every input
    * row present. NULL scores are excluded (no bin).
    */
  def quotaSelectByScore(scored: DataFrame, idCol: String, scoreCol: String,
                         quota: Long, bins: Int = 1000): DataFrame = {
    require(quota >= 0, "quotaSelectByScore: non-negative quota")
    require(bins > 0, "quotaSelectByScore: positive bins")
    // the slim projection feeds BOTH the range scan and the binned stream:
    // materialize it once so an expensive upstream (a DSIR chain, an LM
    // scorer) is not re-derived per consumer — the shared-subtree policy
    // of Dedup.scala (checkpoint iff ≥ 2 consumers)
    val s = Checkpoints.tracked(scored.select(col(idCol), col(scoreCol).cast("long").as("__s"))
      .filter(col("__s").isNotNull))
    val range = s.agg(min("__s").as("lo"), max("__s").as("hi"))
    // exact integer grid: (s−lo)·bins < 2^53 at any realistic fixed-point
    // range, so the one double division is correctly rounded and the
    // explicit floor (NOT a bare long cast — DuckDB's double→int cast
    // ROUNDS, Spark's truncates) is bit-identical in both engines
    val binned = s.crossJoin(broadcast(range))
      .select(col(idCol), col("__s"),
        floor(((col("__s") - col("lo")) * lit(bins.toLong)).cast("double") /
          (col("hi") - col("lo") + lit(1L)).cast("double")).cast("long").as("bin"))
    val perBin = binned.groupBy(col("bin")).agg(count(lit(1)).as("n_bin"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc) // bounded: ≤ bins rows ever reach this window
    val verdicts = perBin
      .withColumn("cum", sum(col("n_bin")).over(w))
      .select(col("bin"), ((col("cum") - col("n_bin")) < quota).cast("int").as("keep"))
    binned.join(broadcast(verdicts), "bin")
      .select(col(idCol), col("__s").as(scoreCol), col("bin"), col("keep"))
  }

  def mixtureWeightsNormalized(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val mw = mixtureWeights(docs, sourceCol, textCol)
    val denom = mw.agg(
      aggregate(
        array_sort(collect_list(struct(col(sourceCol).as("s"), col("rel_weight").as("r")))),
        lit(0.0), (acc, x) => acc + x("r")).as("denom"))
    mw.crossJoin(broadcast(denom))
      .withColumn("weight", col("rel_weight") / col("denom"))
      .drop("denom")
  }
}
