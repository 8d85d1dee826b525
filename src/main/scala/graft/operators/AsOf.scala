package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark SQL lacks natively,
  * composed from existing ops per the preference order (SURVEY.md §7.3):
  * no custom physical plan needed, because a union + per-key ordered window
  * expresses the semantics exactly with ONE shuffle on the join key.
  *
  * For each left row, attaches the greatest right-side `timeCol` ≤ the left
  * row's time (inclusive), per key — the classic "latest quote at or before
  * the trade". Left rows with no prior right row get null.
  *
  * Scale: both sides shuffle once on (key) and sort within partitions —
  * identical cost to one sort-merge join, no per-row range scan. Skewed
  * keys are handled by AQE or [[Skew]] salting upstream.
  */
object AsOf {

  /** @param left     (keyCol, timeCol, ...payload)
    * @param right    (keyCol, timeCol)
    * @param out      name of the attached column (right side's time)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      out: String = "asof_time"): DataFrame = {
    val leftCols = left.columns
    // tag and align schemas: right rows carry their time — in its ORIGINAL
    // type (a cast to long would truncate sub-second timestamps/fractional
    // times) — as the value to propagate; at equal times right sorts
    // BEFORE left (inclusive join)
    val vType = right.schema(timeCol).dataType
    val l = left.withColumn("__v", lit(null).cast(vType)).withColumn("__is_left", lit(1))
    val r = right.select(
      col(keyCol), col(timeCol),
      col(timeCol).as("__v"), lit(0).as("__is_left"))
    val aligned = l.select(
      (Seq(col(keyCol), col(timeCol), col("__v"), col("__is_left")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    aligned
      .withColumn(out, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__v", "__is_left")
  }
}
