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

  // --------------------------------------------- bucket-scoped state

  /** Synthesized store key: turn rows ≥ 0 as turn·10¹² + session·10⁶
    * + USER — each component < 10⁶ by the synthetic-data contract,
    * the composite stays well under 2⁶³. The user sits in the LOW
    * bits deliberately: the store buckets by `tkey mod buckets`, and
    * 10⁶/10¹² are multiples of any small bucket count, so the bucket
    * is effectively `user mod buckets` — one user's whole
    * conversation history co-locates, and a batch touches exactly
    * its users' buckets. (turn-major would make bucket ≡ turn_id:
    * every conversation's first turn in ONE bucket — a full-store
    * rewrite per batch.) Per-user last-t rows and the batch ledger
    * live in reserved negative ranges so one keyed store holds all
    * three row kinds and commits atomically per bucket. */
  private val TKeyLastT = -1000000000000000L
  private val TKeyLedger = -2000000000000000L

  private def turnKey = col("turn_id") * 1000000000000L +
    col("session_id") * 1000000L + col("user_id")

  private def storeRows(turns: DataFrame, lastT: DataFrame,
                        ledgerIds: DataFrame): DataFrame =
    turns.select(turnKey.as("tkey"), col("user_id"), col("session_id"),
        col("turn_id"), col("role"), col("n_events"), col("value_fp"),
        col("turn_text"))
      .unionByName(lastT.select(
        (lit(TKeyLastT) - col("user_id")).as("tkey"), col("user_id"),
        lit(0L).as("session_id"), lit(0L).as("turn_id"),
        lit("__t__").as("role"), lit(0L).as("n_events"),
        col("last_t").as("value_fp"), lit("").as("turn_text")))
      .unionByName(ledgerIds.select(
        (lit(TKeyLedger) - col("id")).as("tkey"), lit(-1L).as("user_id"),
        lit(0L).as("session_id"), lit(0L).as("turn_id"),
        lit("__ledger__").as("role"), lit(0L).as("n_events"),
        lit(0L).as("value_fp"), lit("").as("turn_text")))

  /** [[processSftBatch]] with BUCKET-SCOPED state I/O: the standing
    * turns live in a [[graft.operators.Lakehouse]] keyed store
    * (bucket = tkey mod buckets) and each batch lands as a MERGE of
    * only the rows it changes — extended/fresh turns
    * ([[Sft.foldTurnsDelta]]), the batch users' last-t rows, and one
    * ledger sentinel. Write I/O is ∝ buckets holding touched keys,
    * never the standing corpus — the honest 100-TB difference from
    * the whole-table overwrite sink (which this query family keeps
    * as the q288-class baseline). Replay safety is the same in-table
    * ledger: a landed batch id short-circuits before any write. */
  def processSftBatchBucketed(batch: DataFrame, batchId: Long,
                              path: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    val batchT = Sft.rawTurns(batch).groupBy(col("user_id"))
      .agg(max(col("t")).as("last_t"))
    val ledgerId = spark.range(1).select(lit(batchId).as("id"))
    if (!exists) {
      graft.operators.Lakehouse.writeStore(
        storeRows(Sft.mergedTurns(batch), batchT, ledgerId),
        "tkey", path, buckets)
      return
    }
    val st = spark.read.parquet(path)
    if (st.filter(col("tkey") === TKeyLedger - batchId)
        .head(1).nonEmpty)
      return // replayed batch: the in-store ledger says it landed
    val turns = st.filter(col("tkey") >= 0L)
      .select(col("user_id"), col("session_id"), col("turn_id"),
        col("role"), col("n_events"), col("value_fp"), col("turn_text"))
    val lastT = st.filter(col("role") === "__t__")
      .select(col("user_id"), col("value_fp").as("last_t"))
    val delta = Sft.foldTurnsDelta(turns, Sft.tailOf(turns, lastT),
      batch)
    val mergedT = lastT
      .join(batchT.select(col("user_id")), Seq("user_id"), "left_semi")
      .unionByName(batchT)
      .groupBy(col("user_id")).agg(max(col("last_t")).as("last_t"))
    graft.operators.Lakehouse.mergeInto(spark, path,
      storeRows(delta, mergedT, ledgerId).withColumn("op", lit("U")),
      "tkey", buckets)
    ()
  }

  /** Turn rows of a bucketed store. */
  def readTurnsBucketed(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame =
    spark.read.parquet(path).filter(col("tkey") >= 0L)
      .select(col("user_id"), col("session_id"), col("turn_id"),
        col("role"), col("n_events"), col("value_fp"), col("turn_text"))
}
