// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions: ExpectsInputTypes / TypeCollection are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, TypeCollection}

/** Native codegen expressions for the product-quantization read path
  * (SURVEY.md §7.3 escalation rule — the HOF/exploded-join compositions
  * are measured-slow exactly where PQ matters, the multi-billion-pair
  * ADC scan of the decayed high-dim regime).
  *
  * Layout contracts (shared by [[graft.operators.Pq]]):
  *   - codes are BINARY, one byte per sub-block (k ≤ 256 cells) — the
  *     whole point of PQ at 100 TB is the 32× scan-footprint cut vs a
  *     dim-512 float vector, which array&lt;long&gt; (8 B/code) would
  *     squander 8× of;
  *   - a flat codebook array is laid out [sub][cid][d]:
  *     `flat((sub·k + cid)·subDim + d)`;
  *   - a flat per-query ADC lookup table is laid out [sub][cid]:
  *     `lut(sub·k + cid)`.
  */
object PqExpressions {

  /** Nearest-cell byte codes of `vector` under a flat codebook:
    * one byte per sub-block, ties to the LOWEST cell id (deterministic —
    * same tie-break as the relational min(struct) form, spec-pinned).
    */
  def pqEncodeBytes(vector: Column, codebooksFlat: Column, m: Int): Column =
    ExpressionUtils.column(PqEncodeBytes(
      ExpressionUtils.expression(vector), ExpressionUtils.expression(codebooksFlat), m))

  /** Σ_sub lut[sub·k + codes(sub)] — the ADC partial-distance sum of one
    * (vector codes, query lookup-table) pair.
    */
  def adcSum(codes: Column, lutFlat: Column): Column =
    ExpressionUtils.column(AdcSum(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(lutFlat)))
}

/** Byte-codes encoder: argmin cell per sub-block over a flat codebook.
  * left = vector (array&lt;float|double&gt;, length dim), right = flat
  * codebook (array&lt;float|double&gt;, length m·k·(dim/m)); `m` is the
  * sub-block count. Output: binary, m bytes. k = flat.length·m / dim².
  * Widen-before-arithmetic (doubles), strict left-to-right accumulation —
  * bit-identical to the relational [[graft.operators.Pq.pqEncode]] path.
  */
case class PqEncodeBytes(left: Expression, right: Expression, m: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "pq_encode_bytes"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
        TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = BinaryType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val flat = b.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    require(dim % m == 0, s"$prettyName: dim=$dim not divisible by m=$m")
    val subDim = dim / m
    val k = flat.numElements() / (m * subDim)
    require(k >= 1 && k <= 256 && flat.numElements() == m * k * subDim,
      s"$prettyName: flat codebook length ${flat.numElements()} != m*k*subDim with k in [1,256]")
    val (vf, cf) = (isFloat(left), isFloat(right))
    @inline def v(i: Int): Double = if (vf) vec.getFloat(i).toDouble else vec.getDouble(i)
    @inline def c(i: Int): Double = if (cf) flat.getFloat(i).toDouble else flat.getDouble(i)
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var cid = 0
      while (cid < k) {
        val base = (sub * k + cid) * subDim
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v(sub * subDim + d) - c(base + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = cid } // strict <: ties to lowest cid
        cid += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val vGet = if (isFloat(left)) s"(double) $a.getFloat" else s"$a.getDouble"
      val cGet = if (isFloat(right)) s"(double) $b.getFloat" else s"$b.getDouble"
      val dim = ctx.freshName("dim")
      val subDim = ctx.freshName("subDim")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val cid = ctx.freshName("cid")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      s"""
         |int $dim = $a.numElements();
         |if ($dim % $m != 0) {
         |  throw new IllegalArgumentException("$prettyName: dim=" + $dim + " not divisible by m=$m");
         |}
         |int $subDim = $dim / $m;
         |int $k = $b.numElements() / ($m * $subDim);
         |if ($k < 1 || $k > 256 || $b.numElements() != $m * $k * $subDim) {
         |  throw new IllegalArgumentException("$prettyName: flat codebook length "
         |    + $b.numElements() + " != m*k*subDim with k in [1,256]");
         |}
         |byte[] $out = new byte[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $cid = 0; $cid < $k; $cid++) {
         |    int $base = ($sub * $k + $cid) * $subDim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = $vGet($sub * $subDim + $d) - $cGet($base + $d);
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $cid; }
         |  }
         |  $out[$sub] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC sum: left = byte codes (binary, m bytes), right = flat per-query
  * lookup table (array&lt;float|double&gt;, length m·k) laid out
  * [sub][cid]. Output: Σ_sub lut[sub·k + (codes[sub] &amp; 0xFF)], double,
  * strict left-to-right. The hot expression of the decayed-regime PQ
  * scan — billions of evaluations per large uniform batch, each m table
  * loads instead of dim multiply-adds.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "pq_adc_sum"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType,
        TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  private def lutIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.length
    require(m > 0 && lut.numElements() % m == 0,
      s"$prettyName: lut length ${lut.numElements()} not a multiple of m=$m")
    val k = lut.numElements() / m
    val lf = lutIsFloat
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val i = sub * k + (codes(sub) & 0xFF)
      acc += (if (lf) lut.getFloat(i).toDouble else lut.getDouble(i))
      sub += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (lutIsFloat) s"(double) $b.getFloat" else s"$b.getDouble"
      val mV = ctx.freshName("m")
      val kV = ctx.freshName("k")
      val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc")
      s"""
         |int $mV = $a.length;
         |if ($mV == 0 || $b.numElements() % $mV != 0) {
         |  throw new IllegalArgumentException("$prettyName: lut length "
         |    + $b.numElements() + " not a multiple of m=" + $mV);
         |}
         |int $kV = $b.numElements() / $mV;
         |double $acc = 0.0;
         |for (int $sub = 0; $sub < $mV; $sub++) {
         |  $acc += $lGet($sub * $kV + (((int) $a[$sub]) & 0xFF));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
