// Lives under org.apache.spark.sql because ExpectsInputTypes /
// ExpressionUtils are private[sql] — the usual home for third-party
// native expressions (same placement as VectorExpressions).
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the standard multilingual-crawl cleaning step between
  * mojibake repair ([[graft.functions.TextFunctions.fixMojibake]]) and
  * tokenization: decomposed sequences (e + U+0301) and their precomposed
  * forms (é) must collapse to ONE spelling before any dedup key, shingle,
  * token count or vocabulary statistic sees the text, or the same word
  * counts as two.
  *
  * Uses the JDK's `java.text.Normalizer` (Unicode Standard Annex #15 — the
  * same algorithm DuckDB's `nfc_normalize` implements via utf8proc, which
  * is what makes the NFC form oracle-able bit-for-bit). The already-
  * normalized fast path (`Normalizer.isNormalized`, a quick scan that is
  * a no-op for ASCII) returns the input string untouched, so the common
  * all-ASCII corpus pays one scan, zero allocations.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(UnicodeNormalize.Forms.contains(form),
    s"unicode_normalize: form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got '$form'")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.UnicodeNormalize.normalize($c, " +
        s""""$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def column(text: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))
}
