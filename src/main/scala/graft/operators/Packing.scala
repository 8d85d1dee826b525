package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-sequence packing: assign documents (in deterministic id order)
  * to fixed-token-budget training sequences by cumulative token count —
  * the "concatenate-and-chunk to 2048 tokens" step every LLM data pipeline
  * runs between cleaning and tokenizer sharding. A document's sequence is
  * `floor(start / targetTokens)` where `start` is the exact prefix sum of
  * token counts over all lower-id documents.
  *
  * Scale shape — a GLOBAL prefix sum without a global single-partition
  * window: Spark's `Window.orderBy(id)` with no partition key moves the
  * whole table to ONE task, which is exactly the shape this repo bans. The
  * prefix sum is instead computed hierarchically:
  *
  *  1. block the ids (`blk = id div blockSize` — contiguous ranges, so
  *     block membership is a projection, no shuffle);
  *  2. per-block running sums via a window PARTITIONED by block (each
  *     task holds ≤ blockSize rows);
  *  3. block offsets = running sum over the per-block totals — a global
  *     window, but over n/blockSize rows (25 × 10⁹ docs at blockSize 2²⁰
  *     → ~24 k block rows on one task: trivially safe), broadcast back.
  *
  * All arithmetic is integer (longs), so the assignment is oracle-exact;
  * token totals stay far below 2⁶³.
  */
object Packing {

  /** Per-document sequence assignment: (id, n_tok, seq_id).
    *
    * @param targetTokens token budget per training sequence
    * @param blockSize    prefix-sum block width in id units; tune so
    *                     n/blockSize block rows fit one task comfortably
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    targetTokens: Int, blockSize: Long = 1L << 20): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
    val blocked = toks.withColumn("blk", expr(s"id div $blockSize"))
    val inBlk = blocked.withColumn("run",
      sum(col("n_tok")).over(Window.partitionBy("blk").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = inBlk.groupBy("blk").agg(sum(col("n_tok")).as("blk_tot"))
      .withColumn("blk_off", coalesce(
        sum(col("blk_tot")).over(Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("blk", "blk_off")
    inBlk.join(broadcast(offsets), "blk")
      .withColumn("start", col("blk_off") + col("run") - col("n_tok"))
      .withColumn("seq_id", expr(s"start div $targetTokens"))
      .select("id", "n_tok", "seq_id")
  }

  /** Per-sequence fill report: (seq_id, n_docs, seq_tokens, first_doc,
    * last_doc). `seq_tokens` may overshoot the budget by up to one
    * document (a doc is never split — the standard greedy-by-offset
    * packing contract).
    */
  def sequenceStats(docs: DataFrame, idCol: String, textCol: String,
                    targetTokens: Int, blockSize: Long = 1L << 20): DataFrame =
    packSequences(docs, idCol, textCol, targetTokens, blockSize)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"),
        min(col("id")).as("first_doc"), max(col("id")).as("last_doc"))
}
