package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** In-engine document classifier training + scoring: the multinomial
  * Naive Bayes "curated vs crawl" quality filter (the GPT-3 / CCNet
  * pipeline shape — a linear classifier trained on a labeled seed corpus,
  * applied to the whole crawl to select high-quality documents).
  *
  * Reference scope note: the reference (hsnw_trial.py) has no classifier;
  * this is part of the prompt-mandated training-data-pipeline surface,
  * sitting next to the frozen-LM scorer ([[Retrieval.lmScoreAgainst]]).
  *
  * Cross-engine exactness (DuckDB oracle): every statistic is an integer
  * count; log-probabilities are fixed-pointed per DISTINCT (token, class)
  * — `floor(ln((n_wc+1)/(N_c+V))·1e6 + 0.5)` micro-nats, BIGINT — so
  * document scores are order-independent integer sums. Scoring keeps only
  * tokens the model knows (inner join): out-of-vocabulary tokens carry no
  * class signal under add-one smoothing beyond a near-constant offset,
  * and dropping them keeps the arithmetic exact. Held-out documents with
  * ZERO known tokens are absent from the output by the same join.
  *
  * Scale shape (100 TB): token counts partial-aggregate map-side (the
  * shuffle is one row per distinct (token, class)); the class-total and
  * vocabulary-size tables are 2 rows / 1 row (broadcast); the model is
  * O(2·V) rows joined to documents by an equi-join on token — never a
  * window, never a cartesian bigger than the broadcast scalars.
  */
object Classify {

  /** Fail fast on a malformed label column: training is a binary
    * curated-vs-crawl problem, and the model grid below is hardcoded to
    * classes {0, 1} — a stray class value would silently drop its
    * (token, class) counts while its tokens still inflated the smoothing
    * vocabulary V, skewing every log-prob. The distinct scan is a
    * partial-agg over ≤ |classes| rows (same fail-fast discipline as
    * [[Dedup.winnowOverlapAgainst]]'s id-type guard and [[nbScore]]'s
    * priors check).
    */
  private def requireBinaryClasses(train: DataFrame, clsCol: String, who: String): Unit = {
    val classes = train.select(col(clsCol).cast("int").as("cls")).distinct()
      .collect().map(r => if (r.isNullAt(0)) "NULL" else r.getInt(0).toString).sorted
    require(classes.forall(c => c == "0" || c == "1"),
      s"$who: class column '$clsCol' must only contain {0, 1}, got {${classes.mkString(",")}}")
  }

  /** Train the multinomial NB token model.
    *
    * @param train  labeled seed corpus
    * @param clsCol integer class column (1 = curated/target, 0 = raw)
    * @return (tok, cls, n_wc, lp_fp): one row per (vocabulary token ×
    *         class), including zero-count rows — add-one smoothing gives
    *         them mass, and the scorer needs both classes per token.
    */
  def nbModel(train: DataFrame, clsCol: String, textCol: String): DataFrame = {
    requireBinaryClasses(train, clsCol, "nbModel")
    val toks = train.select(col(clsCol).cast("int").as("cls"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val wc = toks.groupBy("tok", "cls").agg(count(lit(1)).as("n_wc"))
    val vocab = wc.select("tok").distinct()
    val v = vocab.agg(count(lit(1)).as("v"))
    val nc = wc.groupBy("cls").agg(sum("n_wc").as("n_c"))
    vocab.select(col("tok"), explode(array(lit(0), lit(1))).as("cls"))
      .join(wc, Seq("tok", "cls"), "left")
      .withColumn("n_wc", coalesce(col("n_wc"), lit(0L)))
      .join(broadcast(nc), "cls")
      .crossJoin(broadcast(v))
      .select(col("tok"), col("cls"), col("n_wc"),
        floor(log((col("n_wc") + lit(1)).cast("double") /
          (col("n_c") + col("v")).cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("lp_fp"))
  }

  /** Class priors from the seed's document counts: (cls, prior_fp) in
    * micro-nats. Two rows — always broadcast at the use site.
    */
  def nbPriors(train: DataFrame, clsCol: String): DataFrame = {
    requireBinaryClasses(train, clsCol, "nbPriors")
    val nd = train.groupBy(col(clsCol).cast("int").as("cls"))
      .agg(count(lit(1)).as("n"))
    nd.crossJoin(broadcast(nd.agg(sum("n").as("t"))))
      .select(col("cls"),
        floor(log(col("n").cast("double") / col("t").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("prior_fp"))
  }

  /** Score documents under a trained model: (idCol, n_known, llr_fp,
    * pred_hq). `llr_fp` = (Σ n·lp₁ + prior₁) − (Σ n·lp₀ + prior₀) in
    * micro-nats; `pred_hq` = 1 when the curated class wins. `n_known`
    * counts model-known token occurrences (each occurrence once — the
    * cls=1 leg of the join, which matches every known token exactly once).
    */
  def nbScore(docs: DataFrame, model: DataFrame, priors: DataFrame,
              idCol: String, textCol: String): DataFrame = {
    // the priors table is ≤ 2 rows by construction; materializing it here
    // lets a one-class training set FAIL FAST instead of annihilating
    // every scored row through an empty cross join
    val pm = priors.select(col("cls").cast("int"), col("prior_fp").cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    require(pm.contains(0) && pm.contains(1),
      s"nbScore: training data must contain both classes, got priors for ${pm.keys.toSeq.sorted.mkString("{", ",", "}")}")
    val hc = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
    hc.join(model, "tok")
      .groupBy(col(idCol)).agg(
        sum(when(col("cls") === 1, col("n")).otherwise(lit(0L))).as("n_known"),
        sum(when(col("cls") === 1, col("n") * col("lp_fp")).otherwise(lit(0L))).as("s1"),
        sum(when(col("cls") === 0, col("n") * col("lp_fp")).otherwise(lit(0L))).as("s0"))
      .select(col(idCol), col("n_known"),
        ((col("s1") + lit(pm(1))) - (col("s0") + lit(pm(0)))).as("llr_fp"))
      .withColumn("pred_hq", (col("llr_fp") > 0).cast("int"))
  }

  /** Classifier calibration: the precision/recall operating-point table
    * over a labeled, scored corpus — for every score bin, the confusion
    * counts of the policy "keep every document scoring in this bin or
    * higher". This is how a quality-filter threshold is actually chosen
    * (trade kept-volume against curated purity); emitting the whole curve
    * as one bounded table beats point-querying thresholds one at a time.
    *
    * Cross-engine exactness: scores land on an exact integer grid (the
    * [[graft.operators.Sampling.quotaSelectByScore]] bin arithmetic —
    * explicit floor, one correctly-rounded double division on
    * integer-exact operands); all confusion counts are integer sums;
    * precision/recall are ONE exact division each at the very end.
    *
    * Scale shape (100 TB): per-bin counts partial-aggregate to ≤ bins+1
    * rows; the cumulative window orders that bounded table, never the
    * doc stream; the range and total-positive tables are 1-row
    * broadcasts. Output: (bin, thr_fp, n, n_pos, tp, fp, fn, prec, rec),
    * one row per non-empty bin; `thr_fp` = the bin's lowest score (the
    * exact threshold realizing that row's trade-off). NULL scores or
    * labels are excluded.
    */
  def thresholdSweep(scored: DataFrame, scoreCol: String, labelCol: String,
                     bins: Int = 20): DataFrame = {
    require(bins > 0, "thresholdSweep: positive bins")
    // three consumers (range, total-positives, binned stream) — checkpoint
    // the slim projection once rather than re-deriving the scorer per
    // consumer (the Dedup.scala ≥-2-consumers policy)
    val s = Checkpoints.tracked(scored.select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("long").as("__l"))
      .filter(col("__s").isNotNull && col("__l").isNotNull))
    val range = s.agg(min("__s").as("lo"), max("__s").as("hi"))
    val binned = s.crossJoin(broadcast(range))
      .select(col("__s"), col("__l"),
        floor(((col("__s") - col("lo")) * lit(bins.toLong)).cast("double") /
          (col("hi") - col("lo") + lit(1L)).cast("double")).cast("long").as("bin"))
    val perBin = binned.groupBy(col("bin")).agg(
      min("__s").as("thr_fp"), count(lit(1)).as("n"), sum("__l").as("n_pos"))
    val totals = s.agg(sum("__l").as("total_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc) // bounded: ≤ bins+1 rows ever reach this window
    perBin
      .withColumn("tp", sum(col("n_pos")).over(w))
      .withColumn("cum_n", sum(col("n")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("thr_fp"), col("n"), col("n_pos"), col("tp"),
        (col("cum_n") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("cum_n").cast("double")).as("prec"),
        (col("tp").cast("double") / col("total_pos").cast("double")).as("rec"))
  }
}
