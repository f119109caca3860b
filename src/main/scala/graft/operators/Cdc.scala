package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: materialize the current snapshot of a
  * keyed table from a log of upserts and deletes — the lakehouse
  * MERGE/compaction primitive. The snapshot keeps one row per key:
  * the key's LAST operation in (seq) order, including deletes as
  * TOMBSTONES. Retaining tombstones is what makes the fold safe
  * under out-of-order and replayed batches: a late-arriving upsert
  * older than a standing delete loses the per-key max and cannot
  * resurrect the key (drop the tombstone and it silently would —
  * the classic compaction bug; DeleteSpec drills it). [[readView]]
  * filters tombstones at read time.
  *
  * The fold is a per-key MAX over a unique (seq) order — associative,
  * commutative, and idempotent — so batches land in any order, replay
  * for free with no landed-batch ledger (the KMV class, not the CMS
  * class), and the snapshot equals the from-scratch apply of the
  * whole log (q286/q287's shared oracle). Scale shape: one shuffle of
  * the batch on the key, state strictly one row per live-or-deleted
  * key; with state and batch bucketed by key the fold is
  * exchange-free on the standing side.
  */
object Cdc {

  /** Last-op-per-key snapshot INCLUDING tombstones. `opCol` holds
    * 'D' for deletes (anything else is an upsert); `seqCols` must be
    * a per-key-unique total order (e.g. ts + a tiebreaker). Output:
    * keyCol, seqCols, opCol, payloadCols — one row per key. */
  def snapshot(changes: DataFrame, keyCol: String, seqCols: Seq[String],
               opCol: String, payloadCols: Seq[String]): DataFrame = {
    val ordered = seqCols ++ Seq(opCol) ++ payloadCols
    changes.groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("__last"))
      .select(col(keyCol) +:
        ordered.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Fold a raw change batch into a standing snapshot: per-key max
    * over standing row ∪ batch ops. Idempotent and order-free (see
    * object doc); == [[snapshot]] over the full log. */
  def fold(standing: DataFrame, batch: DataFrame, keyCol: String,
           seqCols: Seq[String], opCol: String,
           payloadCols: Seq[String]): DataFrame = {
    val cols = (Seq(keyCol) ++ seqCols ++ Seq(opCol) ++ payloadCols)
      .map(col)
    snapshot(standing.select(cols: _*).unionByName(batch.select(cols: _*)),
      keyCol, seqCols, opCol, payloadCols)
  }

  /** The queryable table: tombstones filtered, op dropped. */
  def readView(snap: DataFrame, opCol: String = "op"): DataFrame =
    snap.filter(col(opCol) =!= "D").drop(opCol)
}
