package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.functions.TextFunctions.tokens

/** Streaming corpus monitoring on the mergeable-sketch substrate: each
  * micro-batch folds its per-source KMV sketch into a persisted sketch
  * table via [[Sketches.kmvMerge]] — per-batch work is one batch scan
  * plus a merge over |sources| k-length arrays, and the standing table
  * never exceeds |sources| rows no matter how much history has
  * streamed through. The live "how many distinct tokens has each
  * source contributed" dashboard at any corpus rate.
  *
  * At-least-once is FREE here, not a caveat: KMV merge is set union —
  * idempotent — so a replayed batch folds to the identical table (the
  * [[graft.SketchSpec]] replay drill pins this), unlike the
  * append-shaped sinks that need landed-id sidecars.
  */
object StreamingSketch {

  /** Start the sketch-fold sink over a stream of (keyCol, textCol)
    * documents. */
  def kmvSink(docs: DataFrame, keyCol: String, textCol: String, k: Int,
              table: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, keyCol, textCol, k, table)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** One micro-batch's fold (factored out for batch-ingest callers
    * and the gated query): batch sketch → union with the standing
    * table → kmvMerge per key → overwrite. The table is |keys| rows
    * of ≤ k longs — rewriting it wholesale per batch IS the bounded
    * design (localCheckpoint first so the overwrite never scans the
    * table it replaces). */
  def processBatch(batch: DataFrame, keyCol: String, textCol: String,
                   k: Int, table: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val bs = Sketches.kMinPerKey(
      batch.select(col(keyCol), explode(tokens(col(textCol))).as("__w"))
        .select(col(keyCol), Sketches.hash48(col("__w")).as("h")),
      keyCol, "h", k)
    val merged =
      if (spark.catalog.tableExists(table))
        spark.table(table).unionByName(bs)
          .groupBy(col(keyCol)).agg(Sketches.kmvMerge(col("hs"), k).as("hs"))
      else {
        // The session catalog is per-JVM but the warehouse dir is not:
        // a table written by a previous JVM (or a crash before the
        // catalog commit) leaves an orphaned location that wedges
        // saveAsTable forever. Unreachable-via-catalog data carries no
        // standing state we could merge, so heal by clearing it.
        clearOrphanedLocation(spark, table)
        bs
      }
    merged.localCheckpoint(true).write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(table)
  }

  /** Delete `<warehouse>/<table>` when the catalog has no entry for
    * `table` — the dir is unreachable leftover state from another JVM
    * or a crashed first write, and its presence makes saveAsTable
    * throw LOCATION_ALREADY_EXISTS on every subsequent batch. */
  private def clearOrphanedLocation(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
