package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Vector distance functions as composable [[Column]] expressions.
  *
  * Re-expresses the reference's scalar distance layer (SURVEY.md F1–F3;
  * reference `hsnw_trial.py:44-60`) Spark-first: built-in higher-order
  * functions (`zip_with` + `aggregate`) stay inside whole-stage codegen, so
  * the distance projection over an `array<float>`/`array<double>` column is
  * vectorized per-row with no UDF serialization boundary.
  *
  * Numerical contract: when both inputs are `array<double>`, the fold is a
  * strict left-to-right sum `(((0+t1)+t2)+…)`, which is bit-identical to a
  * left-associative explicit sum `t1+t2+…` in any IEEE-754 engine (DuckDB
  * oracle included) because `0.0 + t1 == t1` for the non-negative terms
  * used here. This is what makes the DuckDB hash-check exact with no
  * rounding slop.
  */
object Distances {

  /** Upcast an `array<float>` column to `array<double>` so all arithmetic
    * happens in double precision (reference computes float64 results from
    * float32 inputs, `hsnw_trial.py:45`).
    */
  def toDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Dot product Σ aᵢ·bᵢ (native codegen'd expression). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Squared Euclidean distance Σ (aᵢ−bᵢ)² (native codegen'd expression). */
  def sqDist(a: Column, b: Column): Column = VectorExpressions.sqDist(a, b)

  /** Euclidean distance ‖a−b‖₂ (reference `l2_distance`, `hsnw_trial.py:44-45`). */
  def l2(a: Column, b: Column): Column = sqrt(sqDist(a, b))

  /** L2 norm ‖a‖₂. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine distance 1 − cos(a,b), returning exactly 1.0 when either norm is
    * zero (reference convention, `hsnw_trial.py:48-54`). Fused single-loop
    * codegen'd expression.
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  // ---- HOF (built-in higher-order-function) compositions, kept as the
  //      reference implementations the native expressions are tested
  //      against (bit-identical fold order) ----

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column = {
    val na = sqrt(dotHof(a, a))
    val nb = sqrt(dotHof(b, b))
    when(na === lit(0.0) || nb === lit(0.0), lit(1.0))
      .otherwise(lit(1.0) - dotHof(a, b) / (na * nb))
  }

  /** Cosine similarity (0.0 when either norm is zero). */
  def cosineSim(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === lit(0.0) || nb === lit(0.0), lit(0.0))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** Metric registry (reference `_METRICS`, `hsnw_trial.py:57-60`). */
  val metrics: Map[String, (Column, Column) => Column] =
    Map("l2" -> (l2 _), "cosine" -> (cosine _))

  /** Name → distance fn; rejects unknown names like the reference's
    * constructor check (`hsnw_trial.py:88-89`).
    */
  def metric(name: String): (Column, Column) => Column = {
    require(metrics.contains(name), s"unknown metric '$name' (have: ${metrics.keys.mkString(", ")})")
    metrics(name)
  }

  // ---- plain-Scala twins used inside partition-local HNSW build ----
  // (same math, on Array[Float], double accumulation — the hot inner loop
  //  must not cross the Column layer; SURVEY.md §7.3 "graph build inner loop")

  def l2Local(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def metricLocal(name: String): (Array[Float], Array[Float]) => Double = name match {
    case "l2"     => l2Local
    case "cosine" => cosineLocal
    case other    => throw new IllegalArgumentException(s"unknown metric '$other'")
  }

  /** ‖v‖ with EXACTLY [[cosineLocal]]'s na/nb accumulation order — the
    * precomputed-norm half of [[cosineLocalPre]].
    */
  def normLocal(v: Array[Float]): Double = {
    var na = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; na += x * x; i += 1 }
    math.sqrt(na)
  }

  /** Σ aᵢ·bᵢ with EXACTLY [[cosineLocal]]'s dot accumulation order. */
  def dotLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    dot
  }

  /** [[cosineLocal]] with precomputed operand norms — BIT-IDENTICAL
    * (spec-pinned in DistancesSpec): the dot, na and nb accumulators in
    * cosineLocal are independent and i-ascending, so computing the norms
    * separately ([[normLocal]]) and the dot separately ([[dotLocal]])
    * reproduces the same three IEEE values, and ‖a‖==0 ⟺ na==0 keeps the
    * zero-norm rule. This is the graph build's hot-loop form: each
    * stored vector's norm is computed once instead of on every pair —
    * ~3× fewer flops per evaluation at high dim (LocalHnsw caches them).
    */
  def cosineLocalPre(a: Array[Float], aNorm: Double,
                     b: Array[Float], bNorm: Double): Double =
    if (aNorm == 0.0 || bNorm == 0.0) 1.0
    else 1.0 - dotLocal(a, b) / (aNorm * bNorm)
}
