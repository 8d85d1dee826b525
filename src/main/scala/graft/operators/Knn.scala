package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Exact brute-force k-nearest-neighbour query path (SURVEY.md Q1a/Q4/Q8).
  *
  * This is the oracle form of the reference's `HNSW.search`
  * (`hsnw_trial.py:267-294`): score every (query, vector) pair, keep the k
  * best per query. Spark-first design:
  *
  *   - the query set is small and the index is huge, so the queries side is
  *     `broadcast()` — the scan over the index parallelizes with NO shuffle
  *     of index data (BroadcastNestedLoopJoin);
  *   - the per-query top-k then only shuffles the surviving candidate rows.
  *     For a single query the plan collapses to `TakeOrderedAndProject`
  *     (a true distributed top-k, no full sort).
  *
  * Ordering is made total with an `(dist, id)` tiebreak so results are
  * deterministic and oracle-comparable.
  */
object Knn {

  /** Score all pairs: returns (qid, id, dist) for a broadcast query set.
    * `index` must have columns (idCol, vecCol); `queries` (qidCol, vecCol).
    */
  def scoreAll(
      index: DataFrame,
      queries: DataFrame,
      dist: (Column, Column) => Column,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid"): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"), col(vecCol).as("q_vector"))
    index
      .select(col(idCol).as("id"), col(vecCol).as("i_vector"))
      .crossJoin(broadcast(q))
      .select(col("qid"), col("id"), dist(col("i_vector"), col("q_vector")).as("dist"))
  }

  /** Per-query exact top-k via the partial-aggregating TopKByDist custom
    * aggregate: bounded per-group heaps on the map side, so the shuffle
    * carries O(queries × k) rows per partition instead of the full n×q
    * score matrix. Deterministic (dist asc, id asc) — bit-identical to
    * [[exactTopKWindow]].
    */
  def exactTopK(
      index: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: (Column, Column) => Column,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid"): DataFrame = {
    val scored = scoreAll(index, queries, dist, idCol, vecCol, qidCol)
    scored
      .groupBy(col("qid"))
      .agg(org.apache.spark.sql.graft.TopKAggregate.topKByDist(col("dist"), col("id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("entry.id").as("id"), col("entry.dist").as("dist"))
  }

  /** Per-query exact top-k: window rank over the scored pairs (reference
    * form; shuffles every scored row — kept for comparison/tests).
    */
  def exactTopKWindow(
      index: DataFrame,
      queries: DataFrame,
      k: Int,
      dist: (Column, Column) => Column,
      idCol: String = "id",
      vecCol: String = "vector",
      qidCol: String = "qid"): DataFrame = {
    val scored = scoreAll(index, queries, dist, idCol, vecCol, qidCol)
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "dist")
  }

  /** Single-query `ORDER BY dist LIMIT k` (reference Q4: `sorted(scored)[:k]`,
    * `hsnw_trial.py:292-293`) — compiles to TakeOrderedAndProject.
    */
  def topK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("dist").asc, col("id").asc).limit(k)

  /** Rank-annotated result report with label join (reference
    * `query_image_index_and_report`, CIFAR notebook cell-4): top-k plus a
    * broadcast-joined dimension table and a query-row marker.
    */
  def rankedReport(
      index: DataFrame,
      queries: DataFrame,
      labels: DataFrame, // (id, label_name)
      k: Int,
      dist: (Column, Column) => Column): DataFrame = {
    exactTopK(index, queries, k, dist)
      .join(broadcast(labels), Seq("id"), "left")
      .withColumn("marker", when(col("id") === col("qid"), lit("<- QUERY")).otherwise(lit("")))
      .select("qid", "rank", "id", "dist", "label_name", "marker")
  }
}
