package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.operators.UserJourneys

/** Streaming dimension maintenance: each micro-batch of events folds
  * into a standing SCD Type 2 table via [[UserJourneys.scd2Fold]] —
  * the `MERGE INTO`-style slowly-changing-dimension upkeep, expressed
  * as a foreachBatch fold whose per-batch work is the batch plus the
  * touched users' change rows (untouched users pass through verbatim).
  *
  * At-least-once is FREE here, like the KMV sink and unlike the
  * linear sketch folds: an exactly-redelivered batch replays each
  * touched user's compressed stream with rows that either duplicate a
  * standing change row (identical (ts, tie, state) — the lag collapse
  * removes the copy) or were non-changes the first time (state equals
  * the covering range's — collapsed again), so the fold is idempotent
  * and needs no landed-batch ledger. The contract is ordered ingest:
  * batches at-or-after the standing horizon. Mid-history backfill
  * would need collapsed events the standing table no longer has — a
  * rebuild, not a fold.
  */
object StreamingJourneys {

  def scd2Sink(events: DataFrame, userCol: String, tsCol: String,
               stateCol: String, tieCol: String, table: String,
               checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processScd2Batch(batch, userCol, tsCol, stateCol, tieCol, table)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** One micro-batch's fold (factored out for the gated query and
    * batch-ingest callers). localCheckpoint before the overwrite so
    * the job never scans the table it replaces; orphaned warehouse
    * dirs from another JVM are healed before the first CREATE. */
  def processScd2Batch(batch: DataFrame, userCol: String, tsCol: String,
                       stateCol: String, tieCol: String,
                       table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val exists = spark.catalog.tableExists(table)
    if (!exists) graft.operators.Bucketing.dropManagedTable(spark, table)
    val next =
      if (exists)
        UserJourneys.scd2Fold(spark.table(table), batch, userCol, tsCol,
          stateCol, tieCol)
      else
        UserJourneys.scd2States(batch, userCol, tsCol, stateCol, tieCol)
    next.localCheckpoint(true).write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(table)
  }
}
