package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Retrieval, TextStats}
import graft.sources.Datagen

/** Order-of-magnitude scale proof for the TEXT pipeline — the dedup/quality
  * claims' twin of [[ScaleProof]] (which covers the vector ops): the sf0.1
  * bench corpus is 5,000 docs, so every "would hold at 100 TB" argument for
  * the text operators extrapolates from that. This main runs the heavy text
  * operators at 200×+ that size (default 1M synthetic docs, ~80M tokens)
  * with PLANTED duplicates, so correctness of the dedup passes is checked
  * at scale, not just wall time. Prints one JSON line, committed as
  * `BENCH_SCALE_TEXT.json`. Run:
  *
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.TextScaleProof [n]"
  *
  * Corpus: [[Datagen.syntheticDocs]] (word-soup in the test corpus's
  * shape) + 1% exact duplicates (ids n..n+n/100 copy id·100's text) + 1%
  * near duplicates (one token prepended). Phases: Gopher rules, exact
  * dedup, MinHash+LSH candidate pairs, incremental new-batch-vs-corpus
  * dedup, context-window chunking, bloom-pruned dedup, hashed BoW +
  * batch top-k, domain-affinity selection, span-level dedup coverage,
  * ingest-time span scrub, BPE training + segmentation, BM25 retrieval,
  * bigram-LM scoring.
  */
object TextScaleProof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-text-scale-proof")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // bounded-heap TopK aggregations (TypedImperative) stay in the HASH
      // aggregation path instead of sort-falling-back at 128 keys; each
      // buffer holds <= k entries, so 1M keys is a few hundred MB worst case
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // local mode frees shuffle files only when the ContextCleaner GCs
      // dereferenced RDDs; a 96g heap never GCs naturally, so multi-phase
      // proofs accumulate every stage's shuffle spill until ENOSPC
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = Datagen.syntheticDocs(spark, n)
    val nPlant = n / 100
    // exact duplicates: ids [n, n+nPlant) carry id*100's text verbatim
    val exactDups = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") / 100 + n).cast("long").as("doc_id"), col("text"))
    // near duplicates: ids [n+nPlant, n+2*nPlant) prepend one token
    val nearDups = base.filter(col("doc_id") % 100 === 1)
      .select((col("doc_id") / 100 + n + nPlant).cast("long").as("doc_id"),
        concat(lit("zz "), col("text")).as("text"))
    val corpus = base.unionAll(exactDups).unionAll(nearDups).localCheckpoint()
    val total = corpus.count()
    System.err.println(s"[textscale] corpus $total docs ($n base + $nPlant exact-dup + $nPlant near-dup planted)")

    // ---- phase 1: Gopher rules over the full corpus, both forms — the
    // shuffle-free HOF projection vs the relational explode+groupBy ----
    val (keepCountHof, gopherHofSecs) = timed {
      TextStats.gopherRulesHof(corpus, "doc_id", "text").filter(col("keep")).count()
    }
    val (keepCount, gopherSecs) = timed {
      TextStats.gopherRules(corpus, "doc_id", "text").filter(col("keep")).count()
    }
    require(keepCount == keepCountHof,
      s"gopher forms disagree: relational $keepCount vs hof $keepCountHof")
    System.err.println(f"[textscale] gopher rules: $keepCount kept — relational $gopherSecs%.1f s, hof $gopherHofSecs%.1f s")

    // ---- phase 2: exact dedup — planted exact dups must all flag ----
    val (exactFound, exactSecs) = timed {
      Dedup.exactDedup(corpus, "doc_id", "text").filter(col("is_dup")).count()
    }
    System.err.println(f"[textscale] exact dedup: $exactFound dups in $exactSecs%.1f s (planted $nPlant)")

    // ---- phase 3: MinHash + LSH candidate pairs; a planted exact dup
    // collides on every band, so pairs >= planted count ----
    val (lshPairs, lshSecs) = timed {
      val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", n = 3)
      Dedup.lshCandidatePairs(sigs, "doc_id", maxBandSize = 1000)
        .select("id_a", "id_b").distinct().count()
    }
    System.err.println(f"[textscale] lsh pairs: $lshPairs in $lshSecs%.1f s")

    // ---- phase 4: incremental dedup — the planted tail is the "new
    // batch", the base corpus is the existing one; every exact plant must
    // status exact_dup, every near plant near_dup ----
    val newBatch = corpus.filter(col("doc_id") >= n)
    val existing = corpus.filter(col("doc_id") < n)
    val ((incExact, incNear), incSecs) = timed {
      val st = Dedup.incrementalDedup(newBatch, existing, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDf = 1000).localCheckpoint()
      (st.filter(col("status") === "exact_dup").count(),
        st.filter(col("status") === "near_dup").count())
    }
    System.err.println(f"[textscale] incremental dedup: $incExact exact / $incNear near in $incSecs%.1f s " +
      f"(planted $nPlant/$nPlant)")

    // ---- phase 5: context-window chunking over the corpus ----
    val (chunks, chunkSecs) = timed {
      Packing.chunkWindows(corpus, "doc_id", "text", window = 32, stride = 24).count()
    }
    System.err.println(f"[textscale] chunking: $chunks chunks in $chunkSecs%.1f s")

    // ---- phase 6: bloom-pruned exact dedup on the same ingest split —
    // candidate count must land between the planted-exact floor and the
    // batch size (the pruning claim), and the final statuses must agree
    // exactly with phase 4's exact verdicts (no false negatives) ----
    // sizing: ~1M corpus keys → 2^24 bits (2 MiB) ≈ 6% fill at k=5
    val mBits = 1L << 24
    val ((bloomExact, bloomCand), bloomSecs) = timed {
      val bloom = Dedup.bloomBuild(existing, "text", mBits = mBits, k = 5).localCheckpoint()
      val verdicts = Dedup.bloomProbe(bloom, newBatch, "doc_id", "text", mBits = mBits, k = 5)
        .localCheckpoint()
      val cand = verdicts.filter(col("maybe_dup")).count()
      val corpusFps = existing.select(md5(lower(col("text"))).as("fp")).distinct()
      val confirmed = verdicts.filter(col("maybe_dup"))
        .join(corpusFps, Seq("fp"), "left_semi").count()
      (confirmed, cand)
    }
    require(bloomExact == incExact,
      s"bloom-confirmed exact dups $bloomExact != incremental exact verdicts $incExact")
    System.err.println(f"[textscale] bloom dedup: $bloomCand candidates -> $bloomExact confirmed " +
      f"of ${2 * nPlant} new docs in $bloomSecs%.1f s (pruned ${2 * nPlant - bloomCand})")

    // ---- phase 7: hashed BoW features + exact batch top-k — the planted
    // verbatim copy of each query doc must surface at distance 0.0 (the
    // feature pipeline rediscovers the plants via similarity search) ----
    import graft.operators.Features
    val queryIds = Seq(0L, 100L, 200L)
    val ((bowNnz, zeroHits), bowSecs) = timed {
      val bow = Features.hashedBow(corpus, "doc_id", "text", dim = 256).localCheckpoint()
      val nnz = bow.count()
      val zeros = Features.bowCosineTopKBatch(bow, "doc_id", queryIds, k = 10)
        .filter(col("dist") === 0.0)
        .select("qid", "doc_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      (nnz, zeros)
    }
    queryIds.foreach { q =>
      val copyId = q / 100 + n // planted exact copy of doc q (q % 100 == 0)
      require(zeroHits.contains(q -> copyId),
        s"planted copy $copyId of query $q not found at distance 0.0")
    }
    System.err.println(f"[textscale] hashed BoW: $bowNnz sparse cells; batch top-k found all " +
      f"${queryIds.size} planted copies at dist 0.0 in $bowSecs%.1f s")

    // ---- phase 8: domain-affinity selection at corpus scale — target =
    // the planted-duplicate tail (a "domain" whose shingles verbatim-match
    // their base docs). The base docs the plants copied must score 1.0;
    // the target side stays <= `buckets` rows however large the corpus ----
    import graft.operators.Sampling
    val ((dsRows, dsPerfect), dsSecs) = timed {
      val target = corpus.filter(col("doc_id") >= n && col("doc_id") < n + nPlant)
      val scored = Sampling.domainScore(corpus, target, "doc_id", "text", n = 2)
        .localCheckpoint()
      // copied-from bases: doc_id % 100 == 0 in the base range
      val perfect = scored
        .filter(col("doc_id") < n && col("doc_id") % 100 === 0 && col("domain_score") === 1.0)
        .count()
      (scored.count(), perfect)
    }
    require(dsPerfect == nPlant,
      s"expected $nPlant verbatim-copied base docs at domain_score 1.0, got $dsPerfect")
    System.err.println(f"[textscale] domain score: $dsRows docs scored, " +
      f"$dsPerfect/$nPlant copied bases at exactly 1.0 in $dsSecs%.1f s")

    // ---- phase 9: span-level exact substring dedup. The planted exact
    // dups duplicate EVERY shingle of their doc pair, so exactly 3·nPlant
    // docs (copied bases + their copies + the near-dup bases, whose every
    // window recurs one position later in their plant) come back FULLY
    // covered; the near-dup plants themselves keep exactly ONE uncovered
    // token (the prepended "zz", whose first window is unique). Both
    // counts are sharp at 1M docs (~70M positioned 8-shingles; the
    // 100k-word vocabulary makes organic coverage negligible) ----
    val ((fullCov, nearCov, spanCount), spanSecs) = timed {
      val cov = Dedup.spanCoverage(corpus, "doc_id", "text", k = 8)
        .localCheckpoint()
      val full = cov.filter(col("dup_tokens") === col("n_tokens")).count()
      val near = cov.filter(col("dup_tokens") > 0 &&
        col("dup_tokens") === col("n_tokens") - 1).count()
      val spans = Dedup.dupSpans(corpus, "doc_id", "text", k = 8, minRun = 2).count()
      (full, near, spans)
    }
    require(fullCov == 3 * nPlant,
      s"expected ${3 * nPlant} fully span-covered docs, got $fullCov")
    require(nearCov == nPlant,
      s"expected $nPlant docs covered except the prepended token, got $nearCov")
    System.err.println(f"[textscale] span dedup: $fullCov fully-covered docs " +
      f"(= 3 x $nPlant planted), $nearCov all-but-one-covered near-dups, " +
      f"$spanCount spans in $spanSecs%.1f s")

    // ---- phase 10: ingest-time span scrub. Corpus gains one 12-token
    // boilerplate doc; the new batch is FRESH text (different seed — no
    // corpus overlap) with that boilerplate appended. Boundary shingles
    // mix fresh + boilerplate words and match nothing, so the scrub must
    // remove EXACTLY the 12 boilerplate tokens from every new doc ----
    val boiler = (1 to 12).map(i => s"bp$i").mkString(" ")
    val (scrubExact, scrubSecs) = timed {
      val corpusPlus = corpus.unionAll(
        spark.range(1).select(lit(n * 10).as("doc_id"), lit(boiler).as("text")))
      val fresh = Datagen.syntheticDocs(spark, nPlant, seed = 777L)
        .select((col("doc_id") + n * 20).as("doc_id"),
          concat(col("text"), lit(" " + boiler)).as("text"))
      Dedup.scrubSpans(fresh, corpusPlus, "doc_id", "text", k = 8)
        .filter(col("kept_tokens") === col("n_tokens") - 12).count()
    }
    require(scrubExact == nPlant,
      s"expected $nPlant docs scrubbed of exactly 12 tokens, got $scrubExact")
    System.err.println(f"[textscale] span scrub: $scrubExact/$nPlant new docs " +
      f"lost exactly the 12-token boilerplate in $scrubSecs%.1f s")

    // ---- phase 11: BPE trainer + segmenter at corpus scale. The heavy
    // explode is bounded by the DISTINCT-WORD vocabulary (synthetic docs
    // draw from a fixed word universe, exactly like natural language's
    // Zipf head), so 50 merge rounds cost 50 vocab-sized aggregates no
    // matter how many documents the corpus holds; the apply pass is one
    // linear scan. Gates: 50 merges learned, every merge's n_pair
    // positive and non-increasing never guaranteed (greedy BPE is not
    // monotone) — instead require the segmenter to compress: total
    // symbols strictly below total characters-per-token baseline. ----
    val (bpe, bpeSecs) = timed {
      val learned = graft.operators.TextStats.bpeTrainMerges(corpus, "text", merges = 50)
        .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      val seg = graft.operators.TextStats
        .bpeSegmentCounts(corpus, "doc_id", "text", learned)
        .agg(sum(col("n_tokens")), sum(col("n_syms"))).head()
      (learned.size, seg.getLong(0), seg.getLong(1))
    }
    val (nMerges, segTokens, segSyms) = bpe
    require(nMerges == 50, s"expected 50 learned merges, got $nMerges")
    require(segSyms < segTokens * 8,
      s"segmenter did not compress: $segSyms symbols over $segTokens tokens")
    System.err.println(f"[textscale] bpe: $nMerges merges trained + corpus segmented " +
      f"($segSyms syms / $segTokens toks) in $bpeSecs%.1f s")

    // ---- phase 12: retrieval at corpus scale. BM25 over the full token
    // stream — 'zz' appears ONLY in the planted near-dup tail, so its
    // high idf must surface exactly that id range in the top-k (the
    // ubiquitous 'the' contributes ~zero idf and cannot displace it —
    // note a uniformly-drawn wN would: at any n, each wN lands in ~n/1250
    // docs, rarer than the n/100 zz plants); the postings shuffle carries
    // only query-term rows. Then bigram-LM doc scoring, where integer
    // micro-nat accumulation makes every planted EXACT duplicate score
    // bit-identically to its source doc — a determinism property a float
    // sum cannot promise at 32-way parallelism. ----
    val (zzHits, bm25Secs) = timed {
      val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("zz", "the"), k = 100).collect()
      require(top.length == 100, s"bm25 top-k returned ${top.length} rows")
      top.count(_.getLong(0) >= n + nPlant).toLong
    }
    require(zzHits == 100, s"bm25: only $zzHits/100 top docs from the zz-planted range")
    System.err.println(f"[textscale] bm25: top-100 all from the zz range in $bm25Secs%.1f s")

    val (lmDupExact, lmSecs) = timed {
      val scores = Retrieval.lmDocScores(corpus, "doc_id", "text")
        .select(col("doc_id"), col("lp_total_fp")).localCheckpoint()
      val srcs = scores.select(col("doc_id").as("src_id"), col("lp_total_fp").as("src_fp"))
      scores.filter(col("doc_id") >= n && col("doc_id") < n + nPlant)
        .select(col("doc_id"), ((col("doc_id") - n) * 100).as("src_id"), col("lp_total_fp"))
        .join(srcs, "src_id")
        .filter(col("lp_total_fp") === col("src_fp")).count()
    }
    require(lmDupExact == nPlant,
      s"lm scoring: $lmDupExact/$nPlant exact dups matched their source's integer total")
    System.err.println(f"[textscale] lm scores: $lmDupExact/$nPlant planted exact dups " +
      f"bit-identical to sources in $lmSecs%.1f s")

    // ---- phase 13: BATCH BM25 — 10k term queries against the full corpus
    // in ONE pass (the production shape: the token stream joins the
    // broadcast term table once, only matching postings shuffle, per-query
    // top-k through the bounded-heap aggregate so the final shuffle is
    // O(queries × k) rows, never a queries × docs score matrix). At 1M+
    // docs every REACHABLE vocabulary word has df ≫ k, so all 10k queries
    // must return a full top-10. (Reachable: the datagen draws stop-vs-
    // content from h mod 4 and the word id from h mod 100000 with the
    // SAME hash, and 4 | 100000 — so word ids ≡ 0 (mod 4) can never
    // occur; the term table below stays off those residues.) ----
    val ((batchRows, batchQs), batchSecs) = timed {
      val queries = spark.range(0, 10000)
        .select(col("id").cast("int").as("qid"),
          concat(lit("w"),
            (col("id") * 4 + 1 + pmod(col("id"), lit(3L))).cast("string")).as("term"))
      val agg = Retrieval.bm25TopKBatch(corpus, "doc_id", "text", queries, k = 10)
        .agg(count(lit(1)).as("rows"), countDistinct(col("qid")).as("nq")).head()
      (agg.getLong(0), agg.getLong(1))
    }
    require(batchQs == 10000L, s"batch bm25: only $batchQs/10000 queries returned")
    if (n >= 500000L)
      require(batchRows == 100000L, s"batch bm25: $batchRows rows, expected a full 10k×10")
    System.err.println(f"[textscale] batch bm25: $batchQs queries -> $batchRows ranked rows " +
      f"in one pass, $batchSecs%.1f s")

    // ---- phase 14: Naive-Bayes quality filter at corpus scale. Train on
    // the full corpus with planted class markers (curated docs carry
    // "cq1 cq2", raw docs "rq1 rq2"; the word-soup base is label-neutral
    // by construction — every wN lands in both classes at equal rates),
    // score a FRESH held-out batch carrying one marker family each. The
    // markers' llr contribution (~2·ln(n/2) micro-nats) dominates the
    // neutral drift of ~80 word-soup tokens, so the gate is sharp: every
    // held-out verdict must match its marker. Also gates the model shape:
    // exactly 2 rows per distinct training token (the vocab × class grid).
    val ((nbRight, nbHeld, nbModelRows, nbVocab), nbSecs) = timed {
      import graft.operators.Classify
      val marked = corpus.select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 2 === 0, lit(" cq1 cq2"))
          .otherwise(lit(" rq1 rq2"))).as("text"),
        (col("doc_id") % 2 === 0).cast("int").as("cls"))
      val model = Classify.nbModel(marked, "cls", "text").localCheckpoint()
      val priors = Classify.nbPriors(marked, "cls")
      val held = Datagen.syntheticDocs(spark, nPlant, seed = 888L)
        .select((col("doc_id") + n * 30).as("doc_id"),
          concat(col("text"), when(col("doc_id") % 2 === 0, lit(" cq1 cq2"))
            .otherwise(lit(" rq1 rq2"))).as("text"))
      val verdicts = Classify.nbScore(held, model, priors, "doc_id", "text")
        .localCheckpoint()
      val right = verdicts.filter(
        (col("doc_id") % 2 === 0 && col("pred_hq") === 1) ||
        (col("doc_id") % 2 === 1 && col("pred_hq") === 0)).count()
      val vocab = model.select("tok").distinct().count()
      (right, verdicts.count(), model.count(), vocab)
    }
    require(nbHeld == nPlant, s"nb: scored $nbHeld of $nPlant held-out docs")
    require(nbRight == nPlant, s"nb: only $nbRight/$nPlant held-out verdicts match the planted marker")
    require(nbModelRows == 2 * nbVocab, s"nb model: $nbModelRows rows != 2 x $nbVocab vocab")
    System.err.println(f"[textscale] nb filter: $nbRight/$nPlant held-out verdicts correct, " +
      f"model ${nbModelRows} rows over $nbVocab tokens in $nbSecs%.1f s")

    // ---- phase 15: per-source TF-IDF signature at corpus scale. Sources
    // = doc_id mod 20, each with a planted marker token "sigK". At 1M
    // docs every organic word reaches all 20 sources (idf 0 → dropped),
    // so the surviving signature vocabulary is essentially the markers —
    // and each source's rank-1 term MUST be its own marker (tf = n/20,
    // idf = ln 20; no tail word's tf·idf comes within orders of it). ----
    val ((sigRows, sigRank1Ok), sigSecs) = timed {
      val sourced = corpus.select(
        concat(lit("s"), pmod(col("doc_id"), lit(20L)).cast("string")).as("source"),
        col("doc_id"),
        concat(col("text"), lit(" sig"), pmod(col("doc_id"), lit(20L)).cast("string")).as("text"))
      val sig = TextStats.sourceSignature(sourced, "source", "text", topN = 3)
        .localCheckpoint()
      val ok = sig.filter(col("rank") === 1 &&
        col("tok") === concat(lit("sig"), expr("substring(source, 2)"))).count()
      (sig.count(), ok)
    }
    require(sigRank1Ok == 20L,
      s"signature: only $sigRank1Ok/20 sources rank their planted marker first")
    System.err.println(f"[textscale] source signature: $sigRows rows, " +
      f"$sigRank1Ok/20 rank-1 markers in $sigSecs%.1f s")

    // ---- phase 16: winnowing at corpus scale. Sketches are ~2L/(w+1)
    // prints per doc; discovery self-joins the SKETCHES under a df cap
    // (ubiquitous prints — window-mins of stop-word runs — drop, pair-
    // private prints have df 2 and always survive). Gate: every planted
    // exact duplicate (identical text → identical sketch) must surface
    // as a candidate pair with its base. ----
    val ((winRows, winPairsFound), winSecs) = timed {
      val sketch = Dedup.winnowFingerprints(corpus, "doc_id", "text", k = 5, w = 4)
        .localCheckpoint()
      val nSketch = sketch.count()
      val pairs = Dedup.winnowCandidatePairs(corpus, "doc_id", "text",
        k = 5, w = 4, minShared = 2, maxDf = 100).localCheckpoint()
      val planted = spark.range(n, n + nPlant)
        .select((col("id") - n).cast("long").as("base100"), col("id").as("copy_id"))
        .select((col("base100") * 100).as("id_a"), col("copy_id").as("id_b"))
      val found = pairs.join(planted, Seq("id_a", "id_b"), "left_semi").count()
      (nSketch, found)
    }
    require(winPairsFound == nPlant,
      s"winnowing: only $winPairsFound/$nPlant planted exact pairs discovered")
    System.err.println(f"[textscale] winnowing: $winRows sketch rows, " +
      f"$winPairsFound/$nPlant planted pairs discovered in $winSecs%.1f s")

    println(s"""{"n_docs":$total,"gopher_sec":$gopherSecs,"gopher_hof_sec":$gopherHofSecs,"gopher_kept":$keepCount,""" +
      s""""exact_dedup_sec":$exactSecs,"exact_dups_found":$exactFound,""" +
      s""""lsh_sec":$lshSecs,"lsh_pairs":$lshPairs,""" +
      s""""incremental_sec":$incSecs,"incremental_exact":$incExact,"incremental_near":$incNear,""" +
      s""""planted_each":$nPlant,"chunk_sec":$chunkSecs,"chunks":$chunks,""" +
      s""""bloom_sec":$bloomSecs,"bloom_candidates":$bloomCand,"bloom_confirmed":$bloomExact,"bloom_mbits":$mBits,""" +
      s""""bow_sec":$bowSecs,"bow_nnz":$bowNnz,"bow_planted_found":${queryIds.size},""" +
      s""""domain_score_sec":$dsSecs,"domain_scored":$dsRows,"domain_perfect":$dsPerfect,""" +
      s""""span_sec":$spanSecs,"span_full_covered":$fullCov,"span_near_covered":$nearCov,"span_count":$spanCount,""" +
      s""""span_scrub_sec":$scrubSecs,"span_scrub_exact":$scrubExact,""" +
      s""""bpe_sec":$bpeSecs,"bpe_merges":$nMerges,"bpe_tokens":$segTokens,"bpe_syms":$segSyms,""" +
      s""""bm25_sec":$bm25Secs,"bm25_zz_hits":$zzHits,""" +
      s""""lm_sec":$lmSecs,"lm_dup_exact":$lmDupExact,""" +
      s""""bm25_batch_sec":$batchSecs,"bm25_batch_queries":$batchQs,"bm25_batch_rows":$batchRows,""" +
      s""""nb_sec":$nbSecs,"nb_correct":$nbRight,"nb_model_rows":$nbModelRows,""" +
      s""""signature_sec":$sigSecs,"signature_rows":$sigRows,"signature_rank1_ok":$sigRank1Ok,""" +
      s""""winnow_sec":$winSecs,"winnow_sketch_rows":$winRows,"winnow_planted_found":$winPairsFound}""")
    spark.stop()
  }
}
