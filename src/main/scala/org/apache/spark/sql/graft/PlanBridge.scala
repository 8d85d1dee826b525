package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}

/** Thin bridge to `private[sql]` plan/column constructors — lives under the
  * org.apache.spark.sql package for access, like the native expressions.
  * Used by the ANN rewrite rule, which needs to lift a matched logical
  * subtree (the query-table side of a batch kNN join) back into a
  * DataFrame so the index path can consume it.
  */
object PlanBridge {

  /** DataFrame over an analyzed logical plan (Dataset.ofRows). */
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(session.asInstanceOf[ClassicSparkSession], plan)

  /** Column wrapping a resolved expression (ExpressionUtils.column) —
    * attribute-exact selection, immune to name ambiguity.
    */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column — the inverse of [[column]].
    * Lets Column-composed functions (the whole text/pipeline layer) be
    * registered as SQL functions: wrap the call-site child expressions in
    * Columns, compose with the functions API, unwrap the result.
    *
    * Uses the ACTIVE session's node-to-expression converter
    * (`classic.SparkSession.expression`) for an eager conversion —
    * `ExpressionUtils.expression` alone wraps the tree in a lazy
    * `ColumnNodeExpression` that an injected-function call site would
    * carry unresolved all the way into codegen.
    */
  def expression(c: Column): Expression =
    SparkSession.active.asInstanceOf[ClassicSparkSession].expression(c)
}
