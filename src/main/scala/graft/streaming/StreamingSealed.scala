package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.{Lakehouse, Sft}

/** Streaming SEALED-CONVERSATION export: the q366 watermark invariant
  * composed with the q367 phased byte-append, as a foreachBatch sink.
  *
  * Per micro-batch: the batch's events land idempotently under their
  * own `_events/bid=<batchId>` dir, the ingest watermark advances to
  * the landed max, and ONLY the conversations newly sealed by that
  * advance (last event ≤ wm − gap now, but not at the previous
  * watermark — sealing is monotone in the watermark, so "newly
  * sealed" is an interval on the conversation's fixed last-event
  * time) render and APPEND as JSONL shards at byteOffset = the
  * landed byte total. Sealed renders are immutable by the invariant
  * (any strictly-later event is more than a session gap away and
  * must open a NEW session), so no landed shard is ever rewritten —
  * the final layout is byte-identical to a from-scratch phased
  * export, which is exactly what the gate's oracle rebuilds.
  *
  * Replay discipline (the ledger class): a GENERATION state file
  * (`_graft_sealed_state.b<batchId>`, complete-or-absent via
  * temp+rename; newest generation wins, older ones are GC'd after
  * publish) records the completed batch ids, the watermark, the
  * landed byte total, and the landed part-file INVENTORY. A
  * redelivered batch short-circuits on the ledger; a batch that
  * crashed between its line append and its state publish leaves
  * stray part files the next attempt deletes by inventory diff
  * before re-appending — a part file belongs to exactly one
  * (batch, shard) append, so the diff is exact. Generations mean no
  * crash point ever reads as "no state" once a batch has committed
  * (the failure mode a single delete→rename sidecar would have — and
  * under which an inventory heal would WIPE ledgered output). An
  * inventory divergence that is not a stray-suffix tear dies loudly.
  *
  * Scale: the per-batch OUTPUT work is ∝ newly sealed conversations;
  * the inventory check is a directory listing (∝ shard files —
  * metadata, never data). The sealing scan reads the landed event
  * log (the conversation grain needs each sealed conversation's full
  * history); a user-bucketed event landing (the
  * [[StreamingSft.processSftBatchBucketed]] layout) would prune that
  * scan to buckets with sealed activity — composable here because
  * the landing dir layout is orthogonal to the export. */
object StreamingSealed {

  private val StatePrefix = "_graft_sealed_state.b"

  private final case class State(batches: Seq[(Long, Long, Long)],
                                 files: Map[String, Long]) {
    def ids: Set[Long] = batches.map(_._1).toSet
    def wm: Long =
      if (batches.isEmpty) Long.MinValue else batches.maxBy(_._1)._2
    def landed: Long =
      if (batches.isEmpty) 0L else batches.maxBy(_._1)._3
  }

  private type Fs = org.apache.hadoop.fs.FileSystem

  private def stateGens(fs: Fs, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.startsWith(StatePrefix) && !n.endsWith(".tmp"))
      .map(_.stripPrefix(StatePrefix).toLong).toSeq.sorted
  }

  /** Newest complete state generation; None only before the first
    * commit (a published generation is complete-or-absent, so there
    * is no torn-read case to guess about). */
  private def readState(fs: Fs, root: String): State = {
    val gens = stateGens(fs, root)
    if (gens.isEmpty) return State(Nil, Map.empty)
    val p = new org.apache.hadoop.fs.Path(root, StatePrefix + gens.max)
    val in = fs.open(p)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    val (bs, fl) = txt.linesIterator.filter(_.nonEmpty).toSeq
      .partition(_.startsWith("b,"))
    State(
      bs.map { l =>
        val Array(_, id, wm, landed) = l.split(",")
        (id.toLong, wm.toLong, landed.toLong)
      },
      fl.map { l =>
        val Array(_, path, size) = l.split(",")
        path -> size.toLong
      }.toMap)
  }

  private def writeState(fs: Fs, root: String, gen: Long,
                         st: State): Unit = {
    val lines = st.batches.sortBy(_._1)
      .map { case (id, wm, landed) => s"b,$id,$wm,$landed" } ++
      st.files.toSeq.sortBy(_._1).map { case (f, n) => s"f,$f,$n" }
    val p = new org.apache.hadoop.fs.Path(root, StatePrefix + gen)
    val tmp = new org.apache.hadoop.fs.Path(root, StatePrefix + gen + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"state publish failed: $tmp -> $p")
    // GC older generations — the new one is durably in place
    stateGens(fs, root).filter(_ != gen).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(root, StatePrefix + g),
        false)
    }
  }

  /** The landed part-file inventory: relative path -> size, a
    * recursive LISTING of the out dir (metadata only, no data
    * read). */
  private def listParts(fs: Fs, out: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(out)
    if (!fs.exists(root)) return Map.empty
    val it = fs.listFiles(root, true)
    val m = scala.collection.mutable.Map[String, Long]()
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.startsWith("part-")) {
        val rel = s.getPath.toString.stripPrefix(
          fs.makeQualified(root).toString).stripPrefix("/")
        m += rel -> s.getLen
      }
    }
    m.toMap
  }

  def sealedSink(batches: DataFrame, root: String, budgetBytes: Long,
                 checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSealedBatch(batch, batchId, root, budgetBytes)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** One micro-batch of the sealed export (factored out for the
    * gated query and the crash drills). */
  def processSealedBatch(batch: DataFrame, batchId: Long, root: String,
                         budgetBytes: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = readState(fs, root)
    if (st.ids.contains(batchId)) return // ledgered: fully landed
    val outPath = s"$root/out"
    // heal a torn previous attempt BEFORE anything else: stray part
    // files (on disk, absent from the ledgered inventory) are a
    // crashed append's — delete them; any other divergence is not a
    // crashed suffix and must not be silently "repaired". Before the
    // first commit the inventory is empty and stray == everything,
    // which is exactly right: only a crashed batch could have
    // written there.
    val parts = listParts(fs, outPath)
    val stray = parts.keySet -- st.files.keySet
    stray.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(outPath, f), false)
    }
    if ((parts -- stray) != st.files)
      throw new IllegalStateException(
        s"out dir at $outPath diverges from the ledgered inventory " +
          "beyond a crashed-suffix tear — refusing to repair")
    // land the batch's events idempotently under their own bid dir
    if (!batch.isEmpty)
      batch.withColumn("bid", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bid").parquet(s"$root/_events")
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_events")))
      return // nothing ever landed: no watermark to advance
    val full = spark.read.parquet(s"$root/_events").drop("bid")
    val wmRow = full.agg(max(expr("ts div 1000"))).head()
    if (wmRow.isNullAt(0)) return
    val wm = wmRow.getLong(0)
    // newly sealed = sealed at wm, not sealed at the previous
    // watermark (sealing is monotone; a conversation's last-event
    // time is FIXED once sealed)
    val lastT = Sft.rawTurns(full)
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(col("t")).as("lt"))
    val newKeys = lastT
      .filter(col("lt") <= wm - Sft.GapUs &&
        (if (st.batches.isEmpty) lit(true)
         else col("lt") > st.wm - Sft.GapUs))
      .select(col("user_id"), col("session_id"))
    val esc = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "([\"\\\\])", "\\\\$1")
    // one materialization: writeLines evaluates its input twice and
    // the byte total is read once more
    val lines = Sft.render(Sft.mergedTurns(full))
      .join(newKeys, Seq("user_id", "session_id"), "left_semi")
      .select(
        (col("user_id") * 1000000L + col("session_id")).as("ck"),
        concat(lit("{\"ck\":"),
          col("user_id") * 1000000L + col("session_id"),
          lit(",\"render\":\""), esc(col("rendered")), lit("\"}"))
          .as("line"))
      .withColumn("n_bytes", (length(col("line")) + 1L).cast("long"))
      .localCheckpoint(true)
    try {
      Lakehouse.writeLines(lines, "ck", outPath, budgetBytes,
        byteOffset = st.landed, mode = SaveMode.Append)
      val add = lines.agg(coalesce(sum(col("n_bytes")), lit(0L)))
        .head().getLong(0)
      writeState(fs, root, batchId,
        State(st.batches :+ ((batchId, wm, st.landed + add)),
          listParts(fs, outPath)))
    } finally {
      org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(lines)
    }
  }
}
