package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Bpe

/** Streaming ENCODE sink for the saved tokenizer artifact — the
  * deployment shape of q120: documents land on a stream, the trained
  * merges load ONCE from their managed table ([[Bpe.loadMerges]] —
  * the artifact is immutable between retrains, so per-batch reloads
  * would buy nothing and cost a table scan per micro-batch), and each
  * micro-batch is encoded by the same kernel expression the batch
  * path uses and appended to the output table. Completes batch/stream
  * symmetry for the tokenizer artifact: train once (q113), save
  * (q120), then EITHER batch-encode the corpus OR stream-encode
  * arrivals — byte for byte the same tokens (spec-pinned).
  *
  * Same at-least-once caveat as every foreachBatch sink here: a
  * replayed micro-batch re-appends its rows. Encoding is
  * deterministic (merges are frozen for the sink's lifetime), so
  * replay duplicates are EXACT duplicates keyed by `idCol` — a
  * `dropDuplicates(idCol)` read view or a keyed compaction
  * ([[EventStreaming.compactBuckets]] with `dedupKeys = Seq(idCol)`)
  * collapses them losslessly; spec-pinned via the pruned-checkpoint
  * replay drill.
  *
  * Retrain cadence is policy, not mechanism (the [[StreamingAnn]]
  * centroid-drift stance): a NEW artifact version means a NEW sink —
  * tokens from different vocabularies must not mix in one table.
  */
object StreamingBpe {

  /** Start the encode sink: (idCol, textCol) stream → (idCol,
    * n_tokens, toks) appended to `outTable`, tokens from the saved
    * `mergesTable` artifact. */
  def encodeSink(docs: DataFrame, mergesTable: String, outTable: String,
                 idCol: String, textCol: String, checkpointDir: String,
                 byteLevel: Boolean = false, specials: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val merges = Bpe.loadMerges(docs.sparkSession, mergesTable)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val toks =
            TextFunctions.bpeEncode(col(textCol), merges, byteLevel, specials)
          batch.select(col(idCol),
              size(toks).cast("long").as("n_tokens"),
              array_join(toks, " ").as("toks"))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .format("parquet").saveAsTable(outTable)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
