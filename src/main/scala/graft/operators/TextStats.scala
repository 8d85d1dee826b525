package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
