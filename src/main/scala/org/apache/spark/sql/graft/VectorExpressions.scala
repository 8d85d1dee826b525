// Lives under org.apache.spark.sql because ExpectsInputTypes /
// AbstractDataType / TypeCollection / ExpressionUtils are private[sql] —
// the usual home for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Native Catalyst expressions for dense-vector arithmetic, with
  * whole-stage-codegen loops (SURVEY.md §7.3: "custom codegen `Expression`
  * if the HOF composition proves slow" — it does: `zip_with`/`aggregate`
  * are CodegenFallback, i.e. interpreted per row, which dominates the
  * distance-heavy operators at dim 64–784).
  *
  * Numerical contract (same as [[Distances]]): elements are widened to
  * double BEFORE any arithmetic, and every accumulator folds strictly left
  * to right from 0.0 — bit-identical to the DuckDB oracle's explicit
  * left-associative sums, and to the HOF composition it replaces.
  *
  * Inputs may be `array<float>` or `array<double>` (mixed is fine); output
  * is double. Null elements are not supported (the engine's vector columns
  * are `containsNull=false` by construction — FIXTURES.md §1).
  */
abstract class VectorFoldExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
        TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline protected final def elem(arr: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Mismatched lengths would read the shorter array out of bounds
    * (UnsafeArrayData has no bounds check — garbage values, not an error)
    * — reject them, mirroring the reference's dimension validation (F6).
    */
  @inline protected final def checkLengths(x: ArrayData, y: ArrayData): Unit =
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${x.numElements()} vs ${y.numElements()})")

  /** Codegen twin of [[checkLengths]]. */
  protected def lengthCheckCode(a: String, b: String): String =
    s"""if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException("$prettyName: dimension mismatch ("
       |    + $a.numElements() + " vs " + $b.numElements() + ")");
       |}""".stripMargin

  /** Java accessor snippet for codegen. */
  protected def getter(arrVar: String, e: Expression, iVar: String): String =
    if (elemIsFloat(e)) s"(double) $arrVar.getFloat($iVar)" else s"$arrVar.getDouble($iVar)"
}

/** Σ (aᵢ−bᵢ)² — squared Euclidean distance. */
case class VectorSqDist(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "vector_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    checkLengths(x, y)
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val d = elem(x, lf, i) - elem(y, rf, i); acc += d * d; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |${lengthCheckCode(a, b)}
         |int ${i}n = $a.numElements();
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  double $d = ${getter(a, left, i)} - ${getter(b, right, i)};
         |  ${ev.value}Acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ — dot product. */
case class VectorDot(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    checkLengths(x, y)
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { acc += elem(x, lf, i) * elem(y, rf, i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      s"""
         |${lengthCheckCode(a, b)}
         |int ${i}n = $a.numElements();
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  ${ev.value}Acc += ${getter(a, left, i)} * ${getter(b, right, i)};
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance 1 − cos(a,b) with the reference's zero-norm → 1.0
  * convention (`hsnw_trial.py:48-54`). One fused loop accumulates dot, ‖a‖²
  * and ‖b‖² — each accumulator folds independently left-to-right, so each
  * is bit-identical to its standalone sum (oracle-exact).
  */
case class VectorCosineDistance(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "vector_cosine_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    checkLengths(x, y)
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xv = elem(x, lf, i); val yv = elem(y, rf, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val sna = math.sqrt(na); val snb = math.sqrt(nb)
    if (sna == 0.0 || snb == 0.0) 1.0 else 1.0 - dot / (sna * snb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |${lengthCheckCode(a, b)}
         |int ${i}n = $a.numElements();
         |double ${ev.value}Dot = 0.0;
         |double ${ev.value}Na = 0.0;
         |double ${ev.value}Nb = 0.0;
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  double $x = ${getter(a, left, i)};
         |  double $y = ${getter(b, right, i)};
         |  ${ev.value}Dot += $x * $y;
         |  ${ev.value}Na += $x * $x;
         |  ${ev.value}Nb += $y * $y;
         |}
         |double ${ev.value}Sna = java.lang.Math.sqrt(${ev.value}Na);
         |double ${ev.value}Snb = java.lang.Math.sqrt(${ev.value}Nb);
         |${ev.value} = (${ev.value}Sna == 0.0 || ${ev.value}Snb == 0.0)
         |  ? 1.0 : 1.0 - ${ev.value}Dot / (${ev.value}Sna * ${ev.value}Snb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level entry points for the native expressions. */
object VectorExpressions {
  private def expr(c: Column) = ExpressionUtils.expression(c)

  def sqDist(a: Column, b: Column): Column = ExpressionUtils.column(VectorSqDist(expr(a), expr(b)))
  def dot(a: Column, b: Column): Column = ExpressionUtils.column(VectorDot(expr(a), expr(b)))
  def cosine(a: Column, b: Column): Column = ExpressionUtils.column(VectorCosineDistance(expr(a), expr(b)))
}
