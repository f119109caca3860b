package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Streaming SHARD sink — the deployment shape of q144: curated,
  * token-counted documents land on a stream and each micro-batch
  * folds into the on-disk training-shard set via
  * [[Packing.appendShards]], so the physical artifact a trainer
  * mounts stays current between batch re-shards. The first non-empty
  * batch creates the shard set from scratch ([[Packing.writeShards]]);
  * every later batch pays only the incremental-append cost (work ∝
  * batch — prefix sums of landed docs cannot change under the
  * append-only id contract).
  *
  * Replay contract — STRONGER than the at-least-once append sinks
  * here, because the artifact is an idempotent LAYOUT, not a log: a
  * replayed micro-batch's ids are ALL already landed, so it is
  * detected by id-set membership and SKIPPED — its effect is on disk
  * (appendShards lands byte-identical to from-scratch, so "already
  * landed" fully determines the bytes). Membership, NOT a max-id
  * watermark, on purpose: the file source can deliver same-mtime
  * files out of id order, and a watermark would silently drop a
  * fresh out-of-order batch as if it were a replay — data loss. Here
  * a fresh batch always reaches appendShards, whose append-only
  * guard fails FAST on disorder; a batch that only partially
  * overlaps the landed ids is neither replay nor append and throws
  * here. Net: exactly-once shard bytes over an at-least-once
  * channel, no dedup read-view needed, and every contract violation
  * is loud.
  *
  * `budget`/`seqsPerShard` are frozen for the sink's lifetime (they
  * define the layout — changing them means a re-shard, a new sink).
  */
object StreamingShards {

  /** Start the shard sink: (idCol, tokenCol, payload...) stream →
    * sized shard files under `path` (see [[Packing.writeShards]] for
    * the on-disk contract). */
  def shardSink(docs: DataFrame, path: String, idCol: String,
                tokenCol: String, budget: Long, seqsPerShard: Long,
                checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val hp = new org.apache.hadoop.fs.Path(path)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val landed = fs.exists(hp) &&
            fs.globStatus(new org.apache.hadoop.fs.Path(path, "shard_id=*"))
              .nonEmpty
          if (!landed) {
            val packed = Packing.packByBudget(
                batch.select(col(idCol), col(tokenCol)),
                idCol, tokenCol, budget)
              .join(batch.drop(tokenCol), Seq(idCol))
            Packing.writeShards(packed, idCol, path, seqsPerShard)
          } else {
            val landed = spark.read.parquet(path).select(col(idCol))
            val ids = batch.select(col(idCol)).distinct()
            val nBatch = ids.count()
            val nFresh = ids.join(landed, Seq(idCol), "left_anti").count()
            if (nFresh == 0L) {
              // every id already landed: a replayed micro-batch —
              // its bytes are on disk, skip
            } else {
              require(nFresh == nBatch,
                s"batch partially overlaps landed ids ($nFresh of " +
                  s"$nBatch fresh): neither a replay nor an append")
              Packing.appendShards(batch, idCol, tokenCol, path,
                budget, seqsPerShard)
            }
          }
        }
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
