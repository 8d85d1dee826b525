package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.Classify

/** Naive-Bayes quality filter: training statistics, smoothing, scoring
  * semantics, and the plan shape the 100 TB story needs.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // curated (cls=1) docs speak "good", raw (cls=0) docs speak "bad";
  // "the" is common to both
  private def seed = Seq(
    (0L, 1, "good good the"),
    (1L, 1, "good the"),
    (2L, 0, "bad the"),
    (3L, 0, "bad bad bad the")
  ).toDF("doc_id", "cls", "text")

  test("model grid: every vocab token carries BOTH classes; zero counts smoothed") {
    val m = Classify.nbModel(seed, "cls", "text").collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    // vocab = {good, bad, the} -> 6 model rows
    assert(m.size === 6)
    assert(m(("good", 1))._1 === 3L)
    assert(m(("good", 0))._1 === 0L) // zero-count row EXISTS
    assert(m(("bad", 0))._1 === 4L)
    assert(m(("the", 1))._1 === 2L && m(("the", 0))._1 === 2L)
    // add-one smoothing: N_1 = 5, V = 3 -> lp(good|1) = ln(4/8)
    assert(m(("good", 1))._2 === math.floor(math.log(4.0 / 8.0) * 1e6 + 0.5).toLong)
    // zero-count: lp(good|0) = ln(1/(6+3)) (N_0 = 6)
    assert(m(("good", 0))._2 === math.floor(math.log(1.0 / 9.0) * 1e6 + 0.5).toLong)
  }

  test("scoring: curated-looking docs win, raw-looking lose, OOV drops, n_known exact") {
    val model = Classify.nbModel(seed, "cls", "text")
    val priors = Classify.nbPriors(seed, "cls")
    val held = Seq(
      (10L, "good good zzz"), // zzz is OOV: dropped, 2 known tokens
      (11L, "bad bad"),
      (12L, "zzz qqq")        // zero known tokens: absent from output
    ).toDF("doc_id", "text")
    val out = Classify.nbScore(held, model, priors, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out.size === 2, "doc 12 has no known tokens and must be absent")
    assert(out(10L)._1 === 2L)
    assert(out(10L)._3 === 1, "good-speak must classify curated")
    assert(out(11L)._1 === 2L)
    assert(out(11L)._3 === 0, "bad-speak must classify raw")
    // equal priors (2 docs each) cancel in the llr; spot-check doc 11:
    // llr = 2*(lp(bad|1) - lp(bad|0)) = 2*(ln(1/8) - ln(5/9)) micro-nats
    val exp = 2L * (math.floor(math.log(1.0 / 8.0) * 1e6 + 0.5).toLong -
      math.floor(math.log(5.0 / 9.0) * 1e6 + 0.5).toLong)
    assert(out(11L)._2 === exp)
  }

  test("priors: micro-nat ln of document fractions") {
    val skew = Seq((0L, 1, "a"), (1L, 0, "b"), (2L, 0, "c"), (3L, 0, "d"))
      .toDF("doc_id", "cls", "text")
    val p = Classify.nbPriors(skew, "cls").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(p(1) === math.floor(math.log(1.0 / 4.0) * 1e6 + 0.5).toLong)
    assert(p(0) === math.floor(math.log(3.0 / 4.0) * 1e6 + 0.5).toLong)
  }

  test("plan: no window; model joins by token equi-join; scalars broadcast") {
    val s = Classify.nbScore(
      Seq((10L, "good")).toDF("doc_id", "text"),
      Classify.nbModel(seed, "cls", "text"),
      Classify.nbPriors(seed, "cls"),
      "doc_id", "text").queryExecution.explainString(FormattedMode)
    assert(!s.contains("Window"))
    assert(!s.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(s).length >= 2,
      "token counts must partial-aggregate map-side")
  }

  test("thresholdSweep: hand-checked confusion table; prec monotone-ish, rec monotone; ends at full recall") {
    // scores 0..9 (bins align 1:1 at bins=10), positives at 5..9 plus a
    // planted false-negative-maker: one positive at score 0
    val scored = ((0L until 10L).map(i => (i, i * 100L, if (i >= 5) 1 else 0)) :+
      ((10L, 0L, 1))).toDF("doc_id", "llr_fp", "label")
    val out = Classify.thresholdSweep(scored, "llr_fp", "label", bins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getDouble(8)))).toMap
    // bin 9 (score 900): keep-above sees the single top positive
    assert(out(9L) === ((900L, 1L, 1L, 0L, 5L, 1.0, 1.0 / 6.0)))
    // bin 5 (scores >= 500): tp 5, fp 0, fn 1 (the planted score-0 positive)
    assert(out(5L) === ((500L, 1L, 5L, 0L, 1L, 1.0, 5.0 / 6.0)))
    // bin 0 (everything kept): tp = all 6 positives, fp = the 5 negatives
    assert(out(0L)._3 === 6L && out(0L)._4 === 5L && out(0L)._5 === 0L)
    assert(out(0L)._7 === 1.0, "keeping everything realizes full recall")
    val recs = out.toSeq.sortBy(-_._1).map(_._2._7)
    assert(recs === recs.sorted, "recall is monotone as the threshold lowers")
  }
}
