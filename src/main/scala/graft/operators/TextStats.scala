package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Relational text statistics: the 100 TB-shape twin of the per-row HOF
  * functions in [[TextFunctions]]. One token explode + one partial-agg
  * groupBy (map-side combine, codegen'd hash aggregate) replaces the
  * interpreted `filter(tokens(...))` lambdas — identical values, linear
  * shuffle of one row per document.
  *
  * Output per doc: (id, text passthrough columns) + n_tokens, n_stop,
  * quality, pred_lang.
  */
object TextStats {

  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
    def hitSum(words: Seq[String], name: String) =
      sum(when(col("tok").isin(words.map(lit): _*), 1L).otherwise(0L)).as(name)
    val aggs =
      hitSum(TextFunctions.Stopwords, "n_stop") +:
        TextFunctions.LangMarkers.map { case (lang, markers) => hitSum(markers, s"score_$lang") }
    val agg = toks.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)

    // zero-fill only where text is present: a null text explodes to no
    // token rows (null agg), and the per-row HOF twins return null there —
    // an unconditional fill would diverge from them on n_stop
    val fillCols = "n_stop" +: TextFunctions.LangMarkers.map(t => s"score_${t._1}")
    val withAgg = fillCols.foldLeft(docs.join(agg, Seq(idCol), "left")) { (df, c) =>
      df.withColumn(c,
        when(col(textCol).isNull, col(c)).otherwise(coalesce(col(c), lit(0L))))
    }

    val nTok = TextFunctions.tokenCount(col(textCol)).cast("double")
    val nStop = col("n_stop").cast("double")
    val nChar = length(col(textCol)).cast("double")
    val meanLen = (nChar - (nTok - lit(1.0))) / nTok
    val lenOk = when(nChar >= 100.0 && nChar <= 2000.0, lit(1.0)).otherwise(lit(0.0))
    val wordOk = when(meanLen >= 3.0 && meanLen <= 12.0, lit(1.0)).otherwise(lit(0.0))
    val quality = (nStop / nTok) * lit(0.4) + lenOk * lit(0.3) + wordOk * lit(0.3)

    val scores = TextFunctions.LangMarkers.map { case (lang, _) => lang -> col(s"score_$lang") }
    val best = greatest(scores.map(_._2): _*)
    val predLang = scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }

    withAgg
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
      .withColumn("quality", quality)
      .withColumn("pred_lang", predLang)
      // internal per-language vote columns stay internal (the documented
      // output shape is passthrough + n_stop/n_tokens/quality/pred_lang)
      .drop(TextFunctions.LangMarkers.map(t => s"score_${t._1}"): _*)
  }

  /** Per-group adaptive quality gate: keep documents at or above the
    * `minPct` quantile of `scoreCol` WITHIN their `groupCol` group (e.g.
    * language) — the corpus-curation rule "keep the top half of each
    * language", which a single global threshold gets wrong for
    * under-represented languages (their score distribution differs, so a
    * global cut either drops a whole language or keeps its spam).
    *
    * Exact `percent_rank` semantics: q_pct = (# group rows with strictly
    * lower score) / (group size − 1), 0.0 for singleton groups; kept =
    * q_pct ≥ minPct. Tied scores share one q_pct, so the gate is
    * deterministic under any row order. Scores must be non-null and
    * non-NaN (filter first); NaN would diverge between engines on join
    * equality.
    *
    * Scale shape: the textbook `percent_rank().over(partitionBy(group)
    * .orderBy(score))` sorts EACH GROUP IN ONE TASK — a mostly-English
    * 100 TB corpus lands on one executor. Instead the score distribution
    * is first collapsed to one row per DISTINCT (group, score) by a
    * partial-aggregated count — the only pass over full data, a plain
    * hash shuffle — then the cumulative/total counts run over that
    * compact distribution table (a per-group sort of distinct scores
    * only, ≪ docs for any bounded scoring formula), and q_pct joins back
    * on (group, score).
    */
  def adaptiveThreshold(df: DataFrame, idCol: String, groupCol: String, scoreCol: String,
                        minPct: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol), col(groupCol), col(scoreCol))
    val counts = base.groupBy(col(groupCol), col(scoreCol)).agg(count(lit(1)).as("c"))
    // one row per distinct (group, score) → the ordered window has no ties
    // and ROWS framing is deterministic
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(groupCol))
    val pct = counts
      .withColumn("below", coalesce(sum(col("c")).over(wOrd), lit(0L)))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("q_pct",
        when(col("n") === 1L, lit(0.0))
          .otherwise(col("below").cast("double") / (col("n") - lit(1L)).cast("double")))
      .select(col(groupCol), col(scoreCol), col("q_pct"))
    base.join(pct, Seq(groupCol, scoreCol))
      .select(col(idCol), col(groupCol), col(scoreCol), col("q_pct"),
        (col("q_pct") >= lit(minPct)).as("kept"))
  }

  /** Bigram language-model table: the top-K bigrams by corpus count with
    * their conditional probability P(w2 | w1) = n(w1 w2) / n(w1 ·) — the
    * classic count-based LM estimate, and the statistic behind
    * perplexity-flavored quality filters and boilerplate detectors.
    * `n_first` counts w1 in bigram-FIRST position (= Σ over its pair
    * counts), so probabilities per w1 sum to exactly 1.
    *
    * Scale shape: one explode, one partial-agg groupBy over bigrams (the
    * only full-data shuffle), then a groupBy + equi-join over DISTINCT
    * bigram rows only; top-K is sort-limit (TakeOrdered — never a full
    * global sort materialized). Integer counts + one exact division;
    * ties on n_pair break by bigram text, so top-K is deterministic.
    */
  def bigramLm(docs: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    val bg = docs
      .select(TextFunctions.tokens(col(textCol)).as("w"))
      .select(explode(TextFunctions.wordShinglesFromTokens(col("w"), 2)).as("bigram"))
    val pairCounts = bg.groupBy("bigram").agg(count(lit(1)).as("n_pair"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val firstCounts = pairCounts.groupBy("w1").agg(sum(col("n_pair")).as("n_first"))
    pairCounts.join(firstCounts, "w1")
      .withColumn("cond_p", col("n_pair").cast("double") / col("n_first").cast("double"))
      .orderBy(col("n_pair").desc, col("bigram"))
      .select("bigram", "w1", "n_pair", "n_first", "cond_p")
      .limit(topK)
  }

  /** Approximate corpus cardinality sketches — the pragmatic statistics
    * tier at 100 TB, where exact `countDistinct` shuffles every distinct
    * value: HyperLogLog++ (`approx_count_distinct`) estimates distinct
    * tokens and distinct documents-per-token-bearing signals in ONE pass
    * with O(1) state per aggregate (relative standard deviation `rsd`,
    * default 5%; memory grows as ~1/rsd²). Spec-only by contract: sketch
    * internals differ across engines, so there is no bit-exact oracle —
    * the spec bounds the estimate against the exact count instead.
    * Output (1 row): n_docs, n_tokens (exact streams), approx_distinct
    * Exact distincts stay available everywhere else in the engine; this
    * is the knob you reach for when the exact pass is the bottleneck.
    */
  def corpusSketch(docs: DataFrame, idCol: String, textCol: String,
                   rsd: Double = 0.05): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    toks.agg(
      approx_count_distinct(col(idCol), rsd).as("approx_docs"),
      count(lit(1)).as("n_tokens"),
      approx_count_distinct(col("tok"), rsd).as("approx_vocab"))
  }

  /** Corpus datacard: the per-(source, language) summary table published
    * alongside a training dataset (composition, volume, duplication,
    * length distribution). One partial-agg groupBy over the corpus —
    * every statistic is either an integer sum/count or the exact median
    * (Spark's exact `percentile`, which for BIGINT inputs interpolates
    * two integers in double space — an exact IEEE operation any engine
    * reproduces). Duplicate volume is measured as docs minus distinct
    * md5(text) — the exact-dedup pass's own fingerprint, so the datacard
    * agrees with what [[graft.operators.Dedup.exactDedup]] would remove.
    *
    * At 100 TB this is one scan + one shuffle of (sources × langs)
    * partial aggregates; the median's per-group sorted buffer is bounded
    * by group cardinality, and a corpus so skewed that one (source, lang)
    * group dominates should fall back to approx_percentile — documented
    * trade-off, not the default.
    * Output: (source, lang, n_docs, distinct_texts, dup_docs,
    * chars_total, tokens_total, min_chars, median_chars, max_chars).
    */
  def datacard(docs: DataFrame, sourceCol: String, langCol: String,
               textCol: String): DataFrame = {
    val len = length(col(textCol)).cast("long")
    docs
      .select(col(sourceCol).as("source"), col(langCol).as("lang"),
        col(textCol), len.as("n_chars"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_toks"),
        md5(col(textCol)).as("fp"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("distinct_texts"),
        (count(lit(1)) - countDistinct(col("fp"))).as("dup_docs"),
        sum(col("n_chars")).as("chars_total"),
        sum(col("n_toks")).as("tokens_total"),
        min(col("n_chars")).as("min_chars"),
        expr("percentile(n_chars, 0.5)").as("median_chars"),
        max(col("n_chars")).as("max_chars"))
  }

  /** BPE-trainer pair statistics: corpus-weighted counts of adjacent
    * character pairs — the quantity a byte-pair-encoding tokenizer trainer
    * maximizes at every merge step. Top-K table of (pair, n_pair) where
    * n_pair = Σ over vocabulary words of (occurrences of the pair in the
    * word) × (word's corpus frequency).
    *
    * Scale shape — the actual BPE-trainer trick: the token STREAM first
    * collapses to the distinct-vocabulary table with counts (one
    * partial-agg groupBy — the only full-data shuffle; natural language
    * vocabulary is orders of magnitude smaller than the stream), and the
    * character-pair explosion runs over vocab entries weighted by
    * `n_tok`. Integer counts throughout; top-K is TakeOrdered with the
    * pair text breaking ties.
    */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
      .filter(length(col("tok")) >= 2)
    vocab
      .select(col("n_tok"),
        explode(transform(sequence(lit(1), length(col("tok")) - lit(1)),
          i => col("tok").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("n_tok")).as("n_pair"))
      .orderBy(col("n_pair").desc, col("pair"))
      .limit(topK)
  }

  /** BPE TRAINER merge loop — the step [[bpePairCounts]] computes one round
    * of, iterated to an actual merge table: the first `merges` byte-pair
    * merges learned from the corpus, exactly the artifact a tokenizer
    * training run produces. Classic BPE over the corpus-weighted word
    * vocabulary: symbols start as characters; each round counts adjacent
    * symbol pairs (weighted by word frequency), merges the argmax pair
    * (ties: pair string ascending — fully deterministic), and rewrites the
    * vocabulary by left-to-right non-overlapping replacement (both JVM
    * `replace` and SQL `replace` share that contract, which keeps a DuckDB
    * oracle byte-exact). Symbols are joined by TWO spaces: with a single
    * separator, adjacent pair occurrences ("a b a b") share the middle
    * space, so a non-overlapping replace would merge only every second
    * occurrence — the doubled separator makes each occurrence's padding
    * disjoint and one pass merges them all, true BPE.
    *
    * Scale shape: the heavy explode runs over the DISTINCT-WORD vocabulary
    * (bounded by vocabulary size, not corpus size — the corpus is touched
    * once for word counts); each round is one partial-agg groupBy + a
    * sort-limit-1 argmax (TakeOrdered, one row to the driver — the same
    * bounded per-iteration driver action as k-means). The vocabulary is
    * localCheckpointed per round with the superseded round released
    * ([[Checkpoints]]), so `merges` rounds pin O(1) frames.
    *
    * Output: (rank, pair, merged, n_pair) — one row per learned merge, in
    * order. Stops early if the vocabulary runs out of pairs.
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
      .filter(length(col("tok")) >= 2)
      .select(col("n_tok"),
        // double-space-joined symbol string: "hello" -> "h  e  l  l  o"
        array_join(transform(sequence(lit(1), length(col("tok"))),
          i => col("tok").substr(i, lit(1))), "  ").as("sym"))
    var vocab = Checkpoints.tracked(vocab0)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= merges && !done) {
      val best = vocab
        .select(col("n_tok"), split(col("sym"), "  ").as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("n_tok"), explode(transform(sequence(lit(1), size(col("ss")) - lit(1)),
          i => concat(element_at(col("ss"), i), lit(" "), element_at(col("ss"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum(col("n_tok")).as("n_pair"))
        .orderBy(col("n_pair").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (bp, bn) = (best(0).getString(0), best(0).getLong(1))
        val merged = bp.replace(" ", "")
        learned += ((r, bp, merged, bn))
        // literal (non-regex) replace via lit() args — token content can
        // never inject into the plan
        // pattern re-doubles the pair's separator; the single-space pad on
        // each side of pattern and replacement preserves the double-join
        // invariant across adjacent matches
        val next = Checkpoints.tracked(vocab.select(col("n_tok"),
          trim(call_function("replace",
            concat(lit(" "), col("sym"), lit(" ")),
            lit(" " + bp.replace(" ", "  ") + " "), lit(s" $merged "))).as("sym")))
        graft.operators.Checkpoints.unpersist(vocab)
        vocab = next
        r += 1
      }
    }
    graft.operators.Checkpoints.unpersist(vocab)
    learned.toSeq.toDF("rank", "pair", "merged", "n_pair")
      .select(col("rank").cast("int").as("rank"), col("pair"), col("merged"), col("n_pair"))
  }

  /** Apply a learned merge table ([[bpeTrainMerges]] output, collected —
    * merge tables are small by construction) to every document: the
    * SEGMENTER half of the tokenizer, counting the BPE symbols each
    * document tokenizes into under the first k merges. The per-token
    * symbol string goes through the same padded left-to-right replace
    * chain the trainer used (pad once, fold the k merges in rank order,
    * count separators at the end), so train→apply round-trips exactly and
    * a SQL oracle replays the chain byte-for-byte.
    *
    * Output per doc: (idCol, n_tokens, n_syms) — n_syms/n_tokens is the
    * compression the merges bought, the statistic a tokenizer-budget
    * planner actually reads. Scale shape: one token explode + one
    * partial-agg groupBy; the merge chain is k nested string replaces
    * inside codegen, no joins, no shuffle beyond the final groupBy.
    */
  def bpeSegmentCounts(docs: DataFrame, idCol: String, textCol: String,
                       mergesTable: Seq[(String, String)]): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) >= 1)
    val s0 = concat(lit(" "),
      array_join(transform(sequence(lit(1), length(col("tok"))),
        i => col("tok").substr(i, lit(1))), "  "),
      lit(" "))
    val chained = mergesTable.foldLeft(s0) { case (acc, (pair, merged)) =>
      call_function("replace", acc,
        lit(" " + pair.replace(" ", "  ") + " "), lit(s" $merged "))
    }
    toks
      .select(col(idCol), size(split(trim(chained), "  ")).cast("long").as("n_sym"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sym")).as("n_syms"))
  }

  /** Deterministic token-id vocabulary for a learned merge table — the
    * artifact that turns the segmenter into an actual TOKENIZER: base ids
    * 0..B−1 for the corpus's distinct characters (binary-sorted — the
    * same order Spark and DuckDB give untyped string sorts), then
    * B+rank−1 for each learned merge's symbol in rank order. A merged
    * string that reappears at a later rank (e.g. "ab"+"c" after "a"+"bc")
    * keeps its FIRST id — one vocabulary entry per distinct symbol.
    * Output: (sym, token_id).
    */
  def bpeVocab(docs: DataFrame, textCol: String,
               mergesTable: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("sym"))
    val base = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) >= 1)
      .select(explode(transform(sequence(lit(1), length(col("tok"))),
        i => col("tok").substr(i, lit(1)))).as("sym"))
      .distinct()
      // the vocabulary is bounded by alphabet size — the one-task window
      // ranks a tiny frame, never the corpus
      .withColumn("token_id", row_number().over(w).cast("long") - 1L)
    // lazy alphabet count (r16): the merged ids' base offset rides a
    // single-row broadcast instead of an eager driver count() job — the
    // whole vocab plan stays lazy, so callers composing it (bpeEncodeIds)
    // run no jobs at construction time
    val nBase = base.agg(count(lit(1)).as("n_base"))
    val merged = mergesTable.map(_._2).zipWithIndex.toDF("sym", "i")
      .crossJoin(broadcast(nBase))
      .select(col("sym"), (col("n_base") + col("i")).as("token_id"))
    base.select("sym", "token_id").union(merged)
      .groupBy(col("sym")).agg(min(col("token_id")).as("token_id"))
  }

  /** The full tokenizer: apply the learned merges to every document and
    * emit the TOKEN-ID ARRAYS a data loader consumes — the last mile
    * [[bpeSegmentCounts]] (which only counts symbols) stops short of.
    * Each token's symbol string goes through the identical padded replace
    * chain, splits into symbols in order, and each symbol looks up its
    * [[bpeVocab]] id in a broadcast hash map (the vocabulary is
    * alphabet+merges sized); symbols outside the vocabulary (new corpus
    * against a frozen table) encode as −1, the conventional unk sentinel. Output:
    * (idCol, token_ids: array&lt;long&gt;) in document order (token order,
    * then symbol order within the token).
    *
    * Scale shape: one pure per-row projection over the corpus — no joins,
    * no shuffle; the vocabulary (alphabet + merges, bounded) is collected
    * once at construction and rides an executor broadcast.
    */
  def bpeEncodeIds(docs: DataFrame, idCol: String, textCol: String,
                   mergesTable: Seq[(String, String)],
                   vocab: DataFrame = null): DataFrame = {
    // r16 shape: a pure per-row DOC-LEVEL projection against a broadcast
    // vocab MAP — zero exchanges. The previous shape exploded every
    // (token, symbol) to a row, broadcast-joined the vocab, and
    // re-assembled each document with a groupBy + collect_list +
    // array_sort — shuffling the whole SYMBOL stream (more rows than the
    // corpus has tokens) to compute something that never leaves its row.
    //
    // The merge chain runs over ONE padded string per document instead of
    // one per token (measured 1.5× faster than the per-token nested-
    // transform form, which itself matched the exploded form locally):
    // every char gets two trailing spaces, so intra-token symbol gaps are
    // exactly 2 spaces while token boundaries are ≥ 3 (original separator
    // space → 3, wider for multi-space runs). A merge pattern
    // " x  y " needs exactly 2 interior spaces, so it can never span a
    // boundary, and each replacement re-emits its outer spaces, so gaps
    // never shrink — the chain is therefore EXACTLY the concatenation of
    // the old per-token chains (bit-equality additionally probed over the
    // full sf0.1 corpus: 0/5000 rows differ). Symbols split back out on
    // "2+ spaces"; (token, symbol) document order is preserved, matching
    // the old (tpos, spos) array_sort. The vocab (alphabet + merges,
    // bounded) rides a single-row broadcast map; misses encode as the
    // conventional -1 unk. Docs with no non-empty token are absent (the
    // trim filter), as before.
    val spaced = concat(lit(" "),
      regexp_replace(col(textCol), "(?s)(.)(?=.)", "$1  "), lit(" "))
    val chained = mergesTable.foldLeft(spaced) { case (acc, (pair, merged)) =>
      call_function("replace", acc,
        lit(" " + pair.replace(" ", "  ") + " "), lit(s" $merged "))
    }
    // r17: the per-symbol lookup was `element_at` on a broadcast Catalyst
    // map inside `transform` — a per-symbol O(|vocab|) LINEAR SCAN, and
    // interpreted (higher-order functions are CodegenFallback; GetMapValue
    // on ArrayBasedMapData probes by scan, not by hash). The vocabulary is
    // alphabet+merges sized — bounded, tiny — so it is collected once at
    // construction and a Scala UDF closes over a broadcast hash map: O(1)
    // per symbol. Only the lookup changed: the padded replace chain and
    // the trim/split stay whole-stage-codegen expressions, misses still
    // encode as the -1 unk sentinel, and the probe measured bit-equality
    // over the full sf0.1 corpus (0/5000 rows differ) at 5× less wall
    // clock (2.57 → 0.52 s noop-sink; the r16 lazy-vocab trade reversed
    // deliberately: per ACTION the vocab subtree evaluated anyway, so
    // total work is equal and the hot path drops the linear scan).
    //
    // The default-vocab path skips [[bpeVocab]]'s plan (whose window +
    // self-referencing count re-evaluate the char explode twice — measured
    // 0.94 s to collect 29 symbols at sf0.1): ONE distinct job collects
    // the alphabet and the ids are assigned driver-side by the identical
    // rule — base ids 0..B−1 in binary (UTF-8 byte) order, exactly
    // Spark's untyped string sort, then B+rank−1 per merge with the FIRST
    // id kept for re-appearing symbols ([[bpeVocab]]'s min(token_id)).
    val vmapLocal: Map[String, Long] =
      if (vocab == null) {
        // alphabet = distinct chars of the token stream. tokens() splits
        // on the single space char and the len>=1 filter only drops empty
        // tokens, so token chars ≡ text chars minus " " — computed with a
        // codegen'd split(text, "") instead of the interpreted
        // transform/substr HOF over every token (same rows, no
        // CodegenFallback in the explode)
        val alphabet = docs
          .select(explode(split(col(textCol), "")).as("sym"))
          .filter(col("sym") =!= " " && col("sym") =!= "")
          .distinct().collect().map(_.getString(0))
        // binary order = unsigned UTF-8 byte order (Java String.compareTo
        // is UTF-16 code-unit order, which disagrees above the BMP)
        val utf8Ord: Ordering[String] = new Ordering[String] {
          def compare(a: String, b: String): Int = {
            val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0
            var c = 0
            val n = math.min(x.length, y.length)
            while (c == 0 && i < n) {
              c = (x(i) & 0xff) - (y(i) & 0xff)
              i += 1
            }
            if (c != 0) c else x.length - y.length
          }
        }
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        alphabet.sorted(utf8Ord).zipWithIndex.foreach { case (s, i) => m(s) = i.toLong }
        val nBase = alphabet.length.toLong
        mergesTable.map(_._2).zipWithIndex.foreach { case (s, i) =>
          if (!m.contains(s)) m(s) = nBase + i
        }
        m.toMap
      } else {
        vocab.select(col("sym"), col("token_id"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    val bc = docs.sparkSession.sparkContext.broadcast(vmapLocal)
    val encode = udf((syms: Seq[String]) => syms.map(s => bc.value.getOrElse(s, -1L)))
    docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), encode(split(trim(chained), "  +")).as("token_ids"))
  }

  /** Repetition statistics per document over word n-gram shingles — the
    * standard repetitive-document filter of LLM training pipelines (a doc
    * that is mostly repeated n-grams is boilerplate/spam, not prose; cf.
    * the duplicate-n-gram-fraction rules in published corpus-cleaning
    * recipes). Output per doc: n_shingles (total, WITH repeats),
    * n_distinct, max_rep (the single most-repeated shingle's count), and
    * dup_ratio = 1 − n_distinct/n_shingles.
    *
    * Scale shape: one explode + two partial-aggregating groupBys (map-side
    * combine both times) — shuffle O(distinct (doc, shingle)) then O(docs),
    * never the token stream. Integer counts + one double division, so a
    * DuckDB oracle reproduces every ratio bit-for-bit. Docs shorter than
    * n tokens have no shingles and are absent from the output (identical
    * in the oracle).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col(idCol), explode(TextFunctions.wordShinglesFromTokens(col("w"), n)).as("shingle"))
    val per = sh.groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("c"))
    per.groupBy(col(idCol)).agg(
        sum(col("c")).as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_rep"))
      .withColumn("dup_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_shingles").cast("double"))
  }

  /** Top-k word n-grams of the corpus by document frequency (ties: corpus
    * frequency desc, then shingle asc — fully deterministic). The staple
    * boilerplate-discovery pass of corpus cleaning: the n-grams appearing
    * in the most documents are the headers/footers/license blurbs a
    * repetition filter should learn.
    *
    * Scale shape: one shingle explode, one partial-agg groupBy (Spark
    * plans the distinct-doc count as a two-phase aggregate on the same
    * shuffle), then a global top-k via sort-limit — TakeOrderedAndProject
    * keeps k rows per partition and merges on the driver, so no single
    * task ever holds the vocabulary. The rank window runs AFTER the limit,
    * over k rows. Output: (shingle, df, cf, rank), k rows.
    */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 3, k: Int = 20): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col("id"), explode(TextFunctions.wordShinglesFromTokens(col("w"), n)).as("shingle"))
    val stats = sh.groupBy("shingle")
      .agg(countDistinct(col("id")).as("df"), count(lit(1)).as("cf"))
    val order = Seq(col("df").desc, col("cf").desc, col("shingle").asc)
    stats.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("rank", "shingle", "df", "cf")
  }

  /** Vocabulary drift between two corpus snapshots — the monitor that
    * catches a crawl pipeline silently changing under you (new spam
    * campaign, a boilerplate source appearing, an extractor regression):
    * the top contributors to total-variation distance between the two
    * token distributions, in EXACT cross-multiplied integers.
    *
    * A token's TV contribution is |p_a − p_b| = |c_a/N_a − c_b/N_b|;
    * cross-multiplying by N_a·N_b gives the integer
    * `drift_num = |c_a·N_b − c_b·N_a|` — same ranking, no division, no
    * float accumulation, reproducible in any engine at any parallelism.
    * (Domain bound: exact while counts × corpus tokens stay under 2⁶³ —
    * at larger scales feed per-mille bucket counts instead of raw ones.)
    *
    * Scale shape: one partial-agg token count per side (shuffle
    * O(vocab)), a vocab-sized full-outer equi-join, totals as single-row
    * broadcasts, and the global top-N through `TakeOrderedAndProject`
    * (per-partition bounded heaps — never a full sort); the rank window
    * runs over the N survivors only. Output: (rank, tok, c_a, c_b,
    * drift_num), rank 1-based by (drift_num desc, tok asc).
    */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String,
                 topN: Int = 20): DataFrame =
    vocabDriftFromCounts(vocabCounts(a, textCol, "c_a"),
      vocabCounts(b, textCol, "c_b"), topN)

  /** Per-token corpus counts — [[vocabDrift]]'s input shape, exposed so
    * the streaming twin can freeze one side and accumulate the other.
    */
  def vocabCounts(docs: DataFrame, textCol: String, as: String): DataFrame = docs
    .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as(as))

  /** [[vocabDrift]] over already-aggregated (tok, c_a) / (tok, c_b)
    * count tables (columns named exactly so).
    */
  def vocabDriftFromCounts(ca: DataFrame, cb: DataFrame, topN: Int): DataFrame = {
    val na = ca.agg(coalesce(sum(col("c_a")), lit(0L)).as("n_a"))
    val nb = cb.agg(coalesce(sum(col("c_b")), lit(0L)).as("n_b"))
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("tok"), col("c_a"), col("c_b"),
        abs(col("c_a") * col("n_b") - col("c_b") * col("n_a")).as("drift_num"))
    val order = Seq(col("drift_num").desc, col("tok").asc)
    joined.orderBy(order: _*).limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("rank", "tok", "c_a", "c_b", "drift_num")
  }

  /** Gopher-style per-document quality rule flags — the published
    * repetition/length/stopword heuristics of large-corpus cleaning
    * recipes (word-count band, mean-word-length band, minimum stopword
    * hits, duplicate-word ratio cap, maximum word length), each reported
    * as its own boolean plus the conjunction (`keep`), so a pipeline can
    * tune or ablate rules individually instead of re-running the scan.
    *
    * Scale shape: one token explode + one partial-agg groupBy (the
    * distinct-word count plans as a two-phase aggregate on the same
    * shuffle) — shuffle O(distinct (doc, word)), never the token stream.
    * Every reported value is integer counts + single exact divisions, so a
    * DuckDB oracle reproduces the doubles and the rule booleans
    * bit-for-bit. Docs with null text are absent from the output.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 30, maxWords: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minStopHits: Long = 2, maxDupRatio: Double = 0.55,
                  maxWordLen: Long = 15): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val agg = toks.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_words"),
      sum(length(col("tok")).cast("long")).as("sum_len"),
      max(length(col("tok")).cast("long")).as("max_word_len"),
      countDistinct(col("tok")).as("n_distinct"),
      sum(when(col("tok").isin(TextFunctions.Stopwords.map(lit): _*), 1L).otherwise(0L))
        .as("n_stop"))
    agg
      .withColumn("mean_word_len", col("sum_len").cast("double") / col("n_words").cast("double"))
      .withColumn("dup_word_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_words").cast("double"))
      .withColumn("word_count_ok", col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("mean_len_ok",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("stop_ok", col("n_stop") >= minStopHits)
      .withColumn("dup_ok", col("dup_word_ratio") <= maxDupRatio)
      .withColumn("word_len_ok", col("max_word_len") <= maxWordLen)
      .withColumn("keep",
        col("word_count_ok") && col("mean_len_ok") && col("stop_ok") &&
          col("dup_ok") && col("word_len_ok"))
      .select(col(idCol), col("n_words"), col("mean_word_len"), col("n_stop"),
        col("dup_word_ratio"), col("max_word_len"), col("word_count_ok"),
        col("mean_len_ok"), col("stop_ok"), col("dup_ok"), col("word_len_ok"), col("keep"))
  }

  /** Quality-rule attribution — the rule-TUNING table: for each Gopher
    * rule, how many documents fail it at all (`n_fail`) and how many fail
    * ONLY it (`n_exclusive` — exactly the docs that relaxing that one
    * rule would rescue). A pipeline operator reads this before touching
    * thresholds: a rule with high exclusive failures is the binding
    * constraint; one whose failures all co-occur with others is free to
    * tighten.
    *
    * Scale shape: [[gopherRules]]'s per-doc booleans (one explode + one
    * partial-agg groupBy) → a 5-way per-doc struct explode (pure
    * projection) → one partial-agg groupBy over 5 rule keys. Output is
    * 5 rows.
    */
  def ruleAttribution(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rules = Seq("word_count_ok", "mean_len_ok", "stop_ok", "dup_ok", "word_len_ok")
    val g = gopherRules(docs, idCol, textCol)
      .withColumn("n_failed_rules",
        rules.map(r => when(!col(r), 1).otherwise(0)).reduce(_ + _))
    g.select(col("n_failed_rules"),
        explode(array(rules.map(r =>
          struct(lit(r).as("rule"), col(r).as("ok"))): _*)).as("x"))
      .select(col("n_failed_rules"), col("x.rule").as("rule"), col("x.ok").as("ok"))
      .groupBy("rule").agg(
        sum(when(!col("ok"), 1L).otherwise(0L)).as("n_fail"),
        sum(when(!col("ok") && col("n_failed_rules") === 1, 1L).otherwise(0L))
          .as("n_exclusive"))
  }

  /** Shuffle-free twin of [[gopherRules]]: every statistic is per-document,
    * so the whole rule set is a pure projection over higher-order functions
    * (size / aggregate / array_distinct / filter on the token array) — NO
    * explode, NO shuffle, identical values (spec-asserted bit-equal).
    *
    * Trade-off, measured at 1.02M docs / ~80M tokens
    * (`BENCH_SCALE_TEXT.json`): this form moves zero shuffle bytes but
    * pays interpreted-lambda evaluation per token (HOF bodies are outside
    * whole-stage codegen), 27.8 s vs the relational form's 17.8 s on this
    * host — the codegen'd explode+hash-aggregate wins when CPU is the
    * constraint. Prefer this form on shuffle-bound clusters (wide rows,
    * congested network), the relational form on CPU-bound ones.
    */
  def gopherRulesHof(docs: DataFrame, idCol: String, textCol: String,
                     minWords: Long = 30, maxWords: Long = 100000,
                     minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                     minStopHits: Long = 2, maxDupRatio: Double = 0.55,
                     maxWordLen: Long = 15): DataFrame = {
    val base = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        aggregate(col("w"), lit(0L), (acc, t) => acc + length(t)).as("sum_len"),
        array_max(transform(col("w"), t => length(t))).cast("long").as("max_word_len"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        size(filter(col("w"), t => t.isin(TextFunctions.Stopwords.map(lit): _*)))
          .cast("long").as("n_stop"))
    base
      .withColumn("mean_word_len", col("sum_len").cast("double") / col("n_words").cast("double"))
      .withColumn("dup_word_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_words").cast("double"))
      .withColumn("word_count_ok", col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("mean_len_ok",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("stop_ok", col("n_stop") >= minStopHits)
      .withColumn("dup_ok", col("dup_word_ratio") <= maxDupRatio)
      .withColumn("word_len_ok", col("max_word_len") <= maxWordLen)
      .withColumn("keep",
        col("word_count_ok") && col("mean_len_ok") && col("stop_ok") &&
          col("dup_ok") && col("word_len_ok"))
      .select(col(idCol), col("n_words"), col("mean_word_len"), col("n_stop"),
        col("dup_word_ratio"), col("max_word_len"), col("word_count_ok"),
        col("mean_len_ok"), col("stop_ok"), col("dup_ok"), col("word_len_ok"), col("keep"))
  }

  /** Zipf head of the corpus vocabulary: the `topR` most frequent words
    * with their cumulative share of ALL tokens — the curve a tokenizer
    * budget or stopword list is read off of. `cum_share` divides two
    * exactly-summed longs, so the doubles are oracle-exact.
    *
    * Scale shape: token explode → partial-agg word counts; the global
    * top-R is a sort-limit (TakeOrderedAndProject), and the rank/cumsum
    * window runs over the R surviving rows only — never over the full
    * vocabulary. The corpus-total token count is a scalar aggregate
    * broadcast back (one row).
    */
  def vocabCoverage(docs: DataFrame, textCol: String, topR: Int = 50): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val order = Seq(col("cnt").desc, col("word").asc)
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.orderBy(order: _*).limit(topR)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt")).over(
        Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("word"), col("cnt"),
        (col("cum_cnt").cast("double") / col("total").cast("double")).as("cum_share"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group — the
    * classic order-statistics cardinality estimator (Bar-Yossef et al.):
    * hash every token to a uniform 32-bit value (md5 prefix, the
    * [[Features.hashedBow]] hash), keep the k SMALLEST DISTINCT hashes
    * per group, and estimate |distinct| = (k−1)·2³² / kth_min. Unlike
    * HLL (whose register layout is engine-specific and not
    * oracle-comparable), every piece here is deterministic: md5 is
    * identical hex in both engines, the k-th order statistic is exact,
    * and the estimate is one exact-rounded double division.
    *
    * Scale shape: NO distinct shuffle exists — the dedup-on-insert
    * bounded heap ([[org.apache.spark.sql.graft.TopKAggregate]], dedup
    * by id = by hash) holds ≤ k entries at every partial stage, so a
    * billion-token group ships k values per map partition instead of
    * its full token or distinct-token stream. That is the sketch's
    * whole point at 100 TB: vocabulary cardinality per domain for the
    * price of a map-side heap. Groups with fewer than k distinct hashes
    * report their EXACT count (the sketch saw everything).
    *
    * Output: (groupCol, n_sketch, kth_hash, est_distinct) — kth_hash is
    * the largest retained hash (the k-th smallest overall when the
    * sketch is full).
    */
  def kmvVocabulary(docs: DataFrame, groupCol: String, textCol: String,
                    k: Int = 128): DataFrame = {
    val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val toks = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(groupCol), h.as("h"))
    toks.groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(
        col("h").cast("double"), col("h"), k).as("top"))
      .select(col(groupCol), size(col("top")).as("n_sketch"),
        element_at(col("top"), size(col("top"))).getField("id").as("kth_hash"))
      .select(col(groupCol), col("n_sketch"), col("kth_hash"),
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            col("kth_hash").cast("double")).as("est_distinct"))
  }

  /** Blocklist-hit context snippets — the human-review-queue extractor:
    * for every occurrence of a watched term, the ± `window` surrounding
    * tokens as one snippet row (doc_id, pos, term, snippet). Policy
    * terms are judged IN CONTEXT ("breast cancer screening" survives a
    * bare-term filter's false positive), so the reviewable unit is the
    * snippet, not the document.
    *
    * Scale shape: the token stream posexplodes once and the term filter
    * prunes it immediately (hits are SPARSE by assumption — a blocklist
    * that matches most tokens is a different problem); the snippet
    * slice re-reads the doc's token array by equi-joining hits back to
    * the doc table — O(hits) join rows, never a second corpus explode.
    * All positions integer, 1-based in the output (both engines' array
    * convention).
    */
  def blocklistContexts(docs: DataFrame, idCol: String, textCol: String,
                        terms: Seq[String], window: Int = 3): DataFrame = {
    require(terms.nonEmpty && window >= 0, "blocklistContexts: terms and window >= 0")
    val hits = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("pos0", "term")))
      .filter(col("term").isin(terms: _*))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("term"))
    val toks = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
    hits.join(toks, idCol :: Nil)
      .select(col(idCol), col("pos"), col("term"),
        concat_ws(" ", slice(col("w"),
          greatest(col("pos") - window, lit(1)),
          least(col("pos") + window, size(col("w"))) -
            greatest(col("pos") - window, lit(1)) + 1)).as("snippet"))
  }

  /** Pairwise source CONTAINMENT from KMV sketches — the GB-KMV idea
    * (Yang et al., ICDE 2019, retrieved corpus) in its set form: instead
    * of intersecting full shingle sets per source pair (quadratic in
    * corpus at 100 TB), keep each source's k smallest distinct shingle
    * hashes and estimate directional containment A⊆B on the UNION
    * sketch: X = k smallest of K_A ∪ K_B, est = |X∩K_A∩K_B| / |X∩K_A| —
    * the standard KMV merge argument (X is a uniform sample of A∪B).
    * Everything after the sketches is integer counts plus ONE exact
    * division, so the ESTIMATE itself is oracle-exact (the oracle
    * replays the same sketches).
    *
    * Scale shape: sketches via the dedup-on-insert bounded heap (≤ k per
    * group at every partial stage — the [[kmvVocabulary]] discipline),
    * materialized once (both pair legs read them); the pair table is
    * |groups|² at the SOURCE level (dozens–thousands, broadcast), and
    * every union window partitions by pair over ≤ 2k rows. Nothing
    * corpus-sized crosses anything. Output: (a, b, x_a, x_ab,
    * containment) for every ordered pair a ≠ b.
    */
  def kmvContainmentPairs(docs: DataFrame, groupCol: String, textCol: String,
                          n: Int = 3, k: Int = 64): DataFrame = {
    require(n >= 1 && k >= 1, "kmvContainmentPairs: positive n and k")
    val h = conv(substring(md5(col("sh")), 1, 8), 16, 10).cast("long")
    // tokens materialized in their own projection FIRST (r16 fix): the
    // previous inline `wordShingles(text)` re-split the document once per
    // shingle element (the lambda-exclusion trap [[TextFunctions
    // .wordShinglesFromTokens]] documents) — O(tokens²) per doc, measured
    // 3.15 s vs 0.3 s for the bare shingle explode at sf0.1
    val sketch = Checkpoints.tracked(docs
      .select(col(groupCol).as("g"), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col("g"),
        explode(TextFunctions.wordShinglesFromTokens(col("w"), n)).as("sh"))
      .select(col("g"), h.as("h"))
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDistDedup(
        col("h").cast("double"), col("h"), k).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id").as("h"))) // both pair legs read the sketches
    val srcs = sketch.select(col("g")).distinct()
    val pairs = srcs.select(col("g").as("a"))
      .crossJoin(broadcast(srcs.select(col("g").as("b"))))
      .filter(col("a") =!= col("b"))
    val aRows = pairs.join(sketch.withColumnRenamed("g", "a"), "a")
      .select(col("a"), col("b"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
    val bRows = pairs.join(sketch.withColumnRenamed("g", "b"), "b")
      .select(col("a"), col("b"), col("h"), lit(0).as("in_a"), lit(1).as("in_b"))
    val union = aRows.unionByName(bRows)
      .groupBy(col("a"), col("b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("a"), col("b")).orderBy(col("h")) // ≤ 2k rows
    union
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("a"), col("b"))
      .agg(sum(col("in_a")).as("x_a"),
        sum(col("in_a") * col("in_b")).as("x_ab"))
      .select(col("a"), col("b"), col("x_a"), col("x_ab"),
        when(col("x_a") === 0, lit(0.0))
          .otherwise(col("x_ab").cast("double") / col("x_a").cast("double"))
          .as("containment"))
  }

  /** Per-group TF-IDF signature terms: the topN tokens that characterize
    * each source against the others — the "distinctive vocabulary" row of
    * a corpus datacard (what a curation reviewer reads to understand what
    * a domain actually contains).
    *
    * score_fp = tf(group, tok) · idf_fp, with idf_fp =
    * `floor(ln(n_groups / n_groups_containing_tok)·1e6 + 0.5)` micro-nats
    * (BIGINT). Tokens present in EVERY group have idf_fp = 0 and are
    * dropped — they carry no signature signal by construction.
    *
    * Scale shape: tf partial-aggregates map-side to one row per distinct
    * (group, token); group-df is a second partial-agg over THAT table
    * (never the token stream); n_groups broadcasts as one row; the
    * per-group topN rides the bounded heap
    * ([[org.apache.spark.sql.graft.TopKAggregate]] on dist = −score,
    * id = 48-bit md5 prefix of the token) so the hottest group costs the
    * same buffer as the smallest — the per-group sort stays the ORACLE's
    * job only. Token strings are recovered by an equi-join on
    * (group, hash); 48 bits keeps in-group collisions out of reach at
    * real vocabulary sizes, and the ordering (score desc, hash asc) is
    * deterministic in both engines regardless.
    *
    * Exactness bound: the heap compares score_fp through its double
    * domain, exact while tf·idf_fp &lt; 2⁵³ (tf up to ~10⁹ at full idf) —
    * beyond that, near-tied scores may order by hash where exact BIGINT
    * arithmetic would separate them; rankings stay deterministic either
    * way.
    *
    * Output: (groupCol, rank, tok, score_fp), rank 1-based.
    */
  def sourceSignature(docs: DataFrame, groupCol: String, textCol: String,
                      topN: Int = 5): DataFrame = {
    val tf = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfGrp = tf.groupBy("tok").agg(count(lit(1)).as("df_grp"))
    val nGrp = docs.select(col(groupCol)).distinct().agg(count(lit(1)).as("n_grp"))
    val hashed = tf.join(dfGrp, "tok").crossJoin(broadcast(nGrp))
      .withColumn("idf_fp",
        floor(log(col("n_grp").cast("double") / col("df_grp").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long"))
      .filter(col("idf_fp") > 0)
      .withColumn("score_fp", col("tf") * col("idf_fp"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 12), 16, 10).cast("long"))
    val top = hashed.groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(
        lit(0.0) - col("score_fp").cast("double"), col("h"), topN).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("h"))
    top.join(hashed.select(col(groupCol), col("h"), col("tok"), col("score_fp")),
        Seq(groupCol, "h"))
      .select(col(groupCol), col("rank"), col("tok"), col("score_fp"))
  }

  /** Count-Min sketch of the token frequency distribution (Cormode &
    * Muthukrishnan 2005 — public): `depth` independent md5-seeded hash
    * rows × `width` counters. The sketch is the bounded-memory answer to
    * "how often does any token occur" when the vocabulary itself no
    * longer fits anywhere — depth·width integers summarize an unbounded
    * token stream, estimates only ever OVER-count (est ≥ true, with
    * ε ≈ e/width overflow mass at probability 1 − e^−depth), and two
    * sketches merge by cell-wise addition (the streaming/shard-combine
    * property; [[kmvVocabulary]] is the distinct-count sibling).
    *
    * Scale shape: ONE partial-agg groupBy over (seed, bucket) — the
    * explode-by-depth fans each token to `depth` rows map-side, combines
    * map-side, and shuffles ≤ depth·width rows total regardless of
    * corpus size. All counts integer.
    */
  def cmsSketch(docs: DataFrame, textCol: String,
                depth: Int = 4, width: Int = 1 << 16): DataFrame = {
    require(depth >= 1 && width >= 1, "cmsSketch: positive depth and width")
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(explode(array((0 until depth).map { i =>
        struct(lit(i).as("seed"),
          pmod(conv(substring(md5(concat(lit(s"s$i|"), col("tok"))), 1, 8), 16, 10)
            .cast("long"), lit(width.toLong)).as("bucket"))
      }: _*)).as("sb"))
      .select(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .groupBy(col("seed"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for every distinct token of a probe set,
    * next to the exact count — the overestimate audit (est ≥ true always;
    * equality exactly when no heavier token collides in every row). The
    * probe set is whatever vocabulary you can afford to enumerate; the
    * sketch answered for tokens you never stored.
    *
    * Scale shape: probes explode to depth rows, equi-join the ≤
    * depth·width-row sketch (broadcastable), min over depth per token.
    */
  def cmsEstimates(docs: DataFrame, textCol: String,
                   depth: Int = 4, width: Int = 1 << 16): DataFrame = {
    // one corpus pass (r16): the sketch's bucket counts are exactly the
    // bucket-sums of the per-token exact counts the audit needs anyway
    // (sum over colliding tokens of their occurrence counts), so the
    // sketch derives from `truth` instead of re-exploding the corpus
    // through [[cmsSketch]] — and the depth hashes are computed once per
    // (token, seed) and shared by the sketch build and the probe side.
    // Identical values by associativity of count/sum.
    val truth = docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_true"))
    val hashed = truth
      .select(col("tok"), col("n_true"), explode(array((0 until depth).map { i =>
        struct(lit(i).as("seed"),
          pmod(conv(substring(md5(concat(lit(s"s$i|"), col("tok"))), 1, 8), 16, 10)
            .cast("long"), lit(width.toLong)).as("bucket"))
      }: _*)).as("sb"))
      .select(col("tok"), col("n_true"), col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
    val sketch = hashed.groupBy(col("seed"), col("bucket")).agg(sum(col("n_true")).as("cnt"))
    hashed.select("tok", "seed", "bucket").join(broadcast(sketch), Seq("seed", "bucket"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("n_est"))
      .join(truth, "tok")
      .select(col("tok"), col("n_true"), col("n_est"))
  }

  /** Per-source token-length quantiles by EXACT histogram inversion —
    * the datacard / context-budget table (what sequence length covers
    * 50/90/99% of each source's documents) computed without ever
    * sorting the document stream: lengths clamp onto a [0, maxLen]
    * integer grid, the per-(source, len) histogram partial-aggregates
    * (≤ maxLen+1 rows per source reach the cumulative window — never a
    * document), and quantile q is the smallest length whose cumulative
    * count covers q% — an integer cross-multiply (`cum·100 ≥ q·total`),
    * no division, no percentile approximation. The returned quantile is
    * the exact order statistic wherever lengths < maxLen (the clamp only
    * coarsens the tail ABOVE maxLen, reported as-is at the cap).
    *
    * Output: (sourceCol, n_docs, p50, p90, p99) — one row per source.
    */
  def lengthQuantiles(docs: DataFrame, sourceCol: String, textCol: String,
                      maxLen: Int = 4096): DataFrame = {
    require(maxLen >= 1, "lengthQuantiles: positive maxLen")
    val hist = docs
      .select(col(sourceCol),
        least(TextFunctions.tokenCount(col(textCol)).cast("long"), lit(maxLen.toLong))
          .as("len"))
      .groupBy(col(sourceCol), col("len")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("len"))
    val tot = hist.groupBy(col(sourceCol)).agg(sum(col("n")).as("t"))
    hist
      .withColumn("cum", sum(col("n")).over(w)) // bounded: ≤ maxLen+1 rows/source
      .join(broadcast(tot), sourceCol)
      .groupBy(col(sourceCol))
      .agg(max(col("t")).as("n_docs"),
        min(when(col("cum") * 100 >= col("t") * 50, col("len"))).as("p50"),
        min(when(col("cum") * 100 >= col("t") * 90, col("len"))).as("p90"),
        min(when(col("cum") * 100 >= col("t") * 99, col("len"))).as("p99"))
  }

  /** `x^(num/2^log2den)` for 0 < num < 2^log2den as an IEEE-EXACT sqrt
    * chain: the binary expansion of the dyadic exponent turns the power
    * into a product of repeated square roots (bit i set → `sqrt^i(x)`),
    * and sqrt and multiply are both correctly-rounded single IEEE ops —
    * so ANY dyadic temperature is bit-identical across engines, with no
    * `pow`/`exp`/`ln` in sight (q49's √ = the num=1, log2den=1 case).
    * Association is fixed left-to-right over ascending bit positions.
    */
  def dyadicPow(x: Column, num: Int, log2den: Int): Column = {
    require(log2den >= 1 && num > 0 && num < (1 << log2den),
      "dyadicPow: exponent must be a dyadic rational in (0, 1)")
    val terms = (1 to log2den).collect {
      case i if ((num >> (log2den - i)) & 1) == 1 =>
        (1 to i).foldLeft(x)((c, _) => sqrt(c))
    }
    terms.reduceLeft(_ * _)
  }

  /** [[graft.operators.Sampling.mixtureWeights]] at an arbitrary dyadic
    * temperature T = num/2^log2den: rel_weight = (n_tokens/max_tokens)^T
    * via [[dyadicPow]] — exact-arithmetic all the way (integer aggregates,
    * one division, sqrt-chain products), so unlike a `pow`-based form it
    * stays oracle-checkable. T→0 flattens the mixture toward uniform,
    * T=1 is proportional; the standard √ is num=1, log2den=1.
    */
  def mixtureWeightsTempered(docs: DataFrame, sourceCol: String, textCol: String,
                             num: Int, log2den: Int): DataFrame = {
    val per = docs.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"),
      max(col("n_tokens")).as("max_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double")).as("token_share"),
        dyadicPow(col("n_tokens").cast("double") / col("max_tokens").cast("double"),
          num, log2den).as("rel_weight"))
  }
}
