package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.Sft

/** Streaming conversation-state sink: each micro-batch of (strictly
  * later) events folds into the standing merged-turns table via
  * [[Sft.foldTurns]]. The fold is NOT idempotent — replaying a batch
  * would extend turn texts twice — so this sink is the LEDGER class
  * (like CMS/histogram, unlike CDC's idempotent max): landed batch
  * ids ride as sentinel rows INSIDE the state table, so state and
  * ledger commit in one overwrite with no torn-write window, and a
  * redelivered batch is skipped whole.
  *
  * In-table encoding (one table = one atomic commit):
  *  - turn rows: the [[Sft.mergedTurns]] schema verbatim;
  *  - per-user last-event-time rows: role `'__t__'`, value_fp =
  *    last_t (the only tail fact turns cannot re-derive; folds by
  *    max — the rest of the tail is recomputed from turns);
  *  - ledger rows: role `'__ledger__'`, user_id = −1 − batchId.
  */
object StreamingSft {

  def sftSink(events: DataFrame, table: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSftBatch(batch, batchId, table)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  private def turnRow(turns: DataFrame): DataFrame =
    turns.select(col("user_id"), col("session_id"), col("turn_id"),
      col("role"), col("n_events"), col("value_fp"), col("turn_text"))

  private def tRows(lastT: DataFrame): DataFrame =
    lastT.select(col("user_id"), lit(0L).as("session_id"),
      lit(0L).as("turn_id"), lit("__t__").as("role"),
      lit(0L).as("n_events"), col("last_t").as("value_fp"),
      lit("").as("turn_text"))

  /** One micro-batch's fold (factored out for the gated query). */
  def processSftBatch(batch: DataFrame, batchId: Long,
                      table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val exists = spark.catalog.tableExists(table)
    if (!exists) graft.operators.Bucketing.dropManagedTable(spark, table)
    val batchT = Sft.rawTurns(batch).groupBy(col("user_id"))
      .agg(max(col("t")).as("last_t"))
    val (turns2, lastT2) =
      if (!exists) {
        (Sft.mergedTurns(batch), batchT)
      } else {
        val st = spark.table(table)
        if (st.filter(col("role") === "__ledger__" &&
            col("user_id") === -1L - batchId).head(1).nonEmpty)
          return // replayed batch: the ledger says it already landed
        val turns = st.filter(!col("role").startsWith("__"))
        val lastT = st.filter(col("role") === "__t__")
          .select(col("user_id"), col("value_fp").as("last_t"))
        val folded = Sft.foldTurns(turns, Sft.tailOf(turns, lastT), batch)
        val mergedT = lastT.unionByName(batchT)
          .groupBy(col("user_id")).agg(max(col("last_t")).as("last_t"))
        (folded, mergedT)
      }
    val ledger = spark.range(1).select(
      lit(-1L - batchId).as("user_id"), lit(0L).as("session_id"),
      lit(0L).as("turn_id"), lit("__ledger__").as("role"),
      lit(0L).as("n_events"), lit(0L).as("value_fp"),
      lit("").as("turn_text"))
    val oldLedger =
      if (exists) spark.table(table).filter(col("role") === "__ledger__")
      else ledger.limit(0)
    turnRow(turns2).unionByName(tRows(lastT2))
      .unionByName(oldLedger).unionByName(ledger)
      .localCheckpoint(true)
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** Reader view: the turn rows only. */
  def readTurns(state: DataFrame): DataFrame =
    state.filter(!col("role").startsWith("__"))
}
