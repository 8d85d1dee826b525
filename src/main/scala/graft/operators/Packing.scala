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
                    targetTokens: Int, blockSize: Long = 1L << 20): DataFrame =
    packFromCounts(docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok")),
      targetTokens, blockSize)

  /** The hierarchical-prefix-sum assignment over an already-counted
    * (id, n_tok) frame — shared by the whitespace packer
    * ([[packSequences]]) and the BPE-id packer ([[packTokenIds]]), whose
    * counts come from real token-id arrays.
    */
  private[graft] def packFromCounts(toks: DataFrame, targetTokens: Int,
                                    blockSize: Long): DataFrame = {
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

  /** Packed TRAINING SEQUENCES carrying real token ids — the data-loader
    * handoff the count-based packers stop one step short of: documents
    * tokenize to id arrays ([[graft.operators.TextStats.bpeEncodeIds]]),
    * pack by their REAL id-array lengths through the same hierarchical
    * prefix sum, and each sequence materializes as the in-order
    * concatenation of its documents' ids. Output: (seq_id, n_docs,
    * seq_tokens, token_ids) — one row per training sequence, ids in
    * (document id, token, symbol) order.
    *
    * Scale shape: everything up to the final concat is [[packSequences]]'
    * shape; the concat is one partial-agg groupBy whose per-sequence
    * payload is bounded by targetTokens + one document (a sequence holds
    * that many ids by construction) — nothing corpus-sized on any task.
    */
  def packTokenIds(docs: DataFrame, idCol: String, textCol: String,
                   mergesTable: Seq[(String, String)], targetTokens: Int,
                   blockSize: Long = 1L << 20): DataFrame = {
    // r16 shape: the token-id payload rides THROUGH the blocked prefix sum
    // instead of being re-derived and joined back on id afterwards — the
    // guide §8 rule (decide with small rows, move big rows once) applied
    // in reverse: here the decision (seq_id) is a projection of the same
    // row, so carrying the payload costs one exchange (blk) + the final
    // seq_id exchange, while the old join-back shape paid an extra
    // id-keyed exchange of the arrays. The per-window-task payload is
    // bounded by blockSize documents (the caller's knob). The block-offset
    // aggregate shares the blk exchange subtree with the window (AQE reuses the materialized stage),
    // so the tokenizer runs exactly once per action.
    val ids = TextStats.bpeEncodeIds(docs, idCol, textCol, mergesTable)
      .select(col(idCol).cast("long").as("id"), col("token_ids"),
        size(col("token_ids")).cast("long").as("n_tok"))
    val blocked = ids.withColumn("blk", expr(s"id div $blockSize"))
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
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"),
        flatten(transform(array_sort(collect_list(struct(col("id"), col("token_ids")))),
          s => s.getField("token_ids"))).as("token_ids"))
  }

  /** The data-loader boundary table for [[packSequences]]' assignment:
    * per document, its sequence and its WITHIN-SEQUENCE token offset —
    * (id, seq_id, seq_off, n_tok, overrun). This is the contract an
    * attention-mask/loss-mask builder consumes: tokens [seq_off,
    * seq_off+n_tok) of sequence seq_id belong to doc id, cross-doc
    * attention masks at the boundaries, and `overrun = 1` marks the at
    * most one document per sequence whose tail crosses the budget (the
    * greedy-by-offset contract — never split, so the loader either pads
    * the next sequence or truncates the tail; the flag tells it which
    * docs need the decision). Same blocked prefix sum, same exact
    * integer arithmetic — one extra projection, no new shuffle.
    */
  def packBoundaries(docs: DataFrame, idCol: String, textCol: String,
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
      .withColumn("seq_off", col("start") - col("seq_id") * targetTokens)
      .withColumn("overrun",
        (col("seq_off") + col("n_tok") > targetTokens).cast("int"))
      .select("id", "seq_id", "seq_off", "n_tok", "overrun")
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

  /** Deterministic training-shard export plan: the "global shuffle" every
    * training run needs, as a pure function of (epoch, id) — no RNG, no
    * driver state, so any executor (or a re-run after failure) derives the
    * same placement. Each document is assigned, per epoch:
    *
    *  - `shard`     = md5-prefix hash of `"epoch|id"` mod `numShards`
    *    (documents land in a DIFFERENT shard each epoch — the
    *    between-epoch reshuffle),
    *  - `shard_pos` = rank within the (epoch, shard) by (hash, id) —
    *    the within-shard read order, also epoch-dependent.
    *
    * Scale shape: one explode (×epochs, a projection), one shuffle into
    * (epoch, shard) groups, and a window PARTITIONED by (epoch, shard) —
    * pick `numShards` so a shard is file-sized (the usual 100k–1M docs),
    * which bounds the window task by construction; there is no global
    * ordering anywhere. The md5-prefix hash (15 hex chars &lt; 2⁶⁰) is the
    * repo's standard cross-engine-exact hash, so a SQL oracle reproduces
    * every (shard, shard_pos) bit-exactly.
    * Output: (id, epoch, shard, shard_pos).
    */
  def shardAssign(docs: DataFrame, idCol: String, numShards: Int, epochs: Int = 1): DataFrame = {
    require(numShards > 0, s"shardAssign: numShards must be positive, got $numShards")
    require(epochs > 0, s"shardAssign: epochs must be positive, got $epochs")
    val hashed = docs
      .select(col(idCol).cast("long").as("id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("h",
        conv(substring(md5(concat(col("epoch").cast("string"), lit("|"),
          col("id").cast("string"))), 1, 15), 16, 10).cast("long"))
      .withColumn("shard", pmod(col("h"), lit(numShards.toLong)))
    hashed
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy("epoch", "shard").orderBy("h", "id"))
          .cast("long") - 1L)
      .select(col("id"), col("epoch").cast("long").as("epoch"), col("shard"), col("shard_pos"))
  }

  /** Context-window chunking: split each document's token stream into
    * windows of `window` tokens advancing by `stride` — the
    * overlapping-window chunker run before tokenizer sharding when
    * documents exceed the model context (stride &lt; window keeps
    * cross-boundary context in both chunks). Window starts are
    * 1, 1+stride, 1+2·stride, … up to the token count, so every token
    * lands in at least one chunk; trailing chunks may be shorter than
    * `window` (the standard overflow-token semantics).
    *
    * Output per (doc, chunk): chunk_id (0-based), start_tok (1-based),
    * n_tokens, chunk_text. Scale shape: a pure projection + explode —
    * no shuffle, no state, linear in corpus size; integer arithmetic +
    * array slicing only, so a DuckDB oracle reproduces every row
    * (including the `chunk_text` strings) exactly.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0, s"chunkWindows: window must be positive, got $window")
    require(stride > 0, s"chunkWindows: stride must be positive, got $stride")
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .select(col(idCol), col("w"),
        explode(sequence(lit(1), size(col("w")), lit(stride))).as("start"))
      .select(col(idCol),
        expr(s"CAST((start - 1) DIV $stride AS BIGINT)").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        least(lit(window), size(col("w")) - col("start") + 1).cast("long").as("n_tokens"),
        array_join(slice(col("w"), col("start"), lit(window)), " ").as("chunk_text"))
  }
}
