package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.{Lakehouse, Sft}

/** Streaming SEALED-CONVERSATION export: the q366 watermark invariant
  * composed with the q367 phased byte-append, as a foreachBatch sink.
  *
  * Per micro-batch: the batch's events land idempotently under their
  * own `_events/bid=<batchId>/ub=<userBucket>` dirs, the ingest
  * watermark advances INCREMENTALLY to `max(prev wm, batch max)` —
  * the watermark is monotone by construction, so no log read ever
  * recomputes it — and ONLY the conversations newly sealed by that
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
  * The sealing scan is BOUNDED, never the log: an ACTIVE-USER state
  * table (`_active/b<gen>`: user_id, last_t — rows kept only while
  * `last_t > wm − gap`, so it is bounded by the session-gap window,
  * not by users-ever-seen) names the only users who can own a newly
  * sealed session this tick: a session with last event in
  * `(prev wm − gap, wm − gap]` belongs to a user who was active at
  * the previous watermark or who appears in this batch — nobody
  * else. Those CANDIDATE users' history is read back bucket-pruned
  * by the `ub` landing column (a partition filter — skipped buckets'
  * files are never opened) and re-run through [[Sft.rawTurns]]:
  * session numbering is a per-user cumulative count, so the pruned
  * per-user FULL-history recompute assigns exactly the session ids a
  * whole-log recompute would — no incremental session-id state to
  * drift under in-window disorder. A user whose sessions have all
  * sealed drops out of the state table; if they return, they re-enter
  * as a batch user and their history re-derives every old session id
  * (already-exported sessions stay excluded by the `> prev wm − gap`
  * lower bound). Per-batch read cost is therefore ∝ candidate users'
  * history — output-proportional — while the old shape re-read and
  * re-aggregated the ENTIRE landed log every tick (per-batch cost
  * growing with stream lifetime, the unbounded-growth scale-killer).
  *
  * Replay discipline (the ledger class): a GENERATION state file
  * (`_graft_sealed_state.b<batchId>`, complete-or-absent via
  * temp+rename; newest generation wins, older ones are GC'd after
  * publish) records the completed batch ids, the watermark, the
  * landed byte total, and the landed part-file INVENTORY; the active
  * table generation `_active/b<batchId>` publishes with it (written
  * first — a crash between leaves a stray generation the next attempt
  * deletes before rewriting). A redelivered batch short-circuits on
  * the ledger; a batch that crashed between its line append and its
  * state publish leaves stray part files the next attempt deletes by
  * inventory diff before re-appending — a part file belongs to
  * exactly one (batch, shard) append, so the diff is exact.
  * Generations mean no crash point ever reads as "no state" once a
  * batch has committed (the failure mode a single delete→rename
  * sidecar would have — and under which an inventory heal would WIPE
  * ledgered output). An inventory divergence that is not a
  * stray-suffix tear dies loudly.
  *
  * Scale: the per-batch OUTPUT work is ∝ newly sealed conversations;
  * the inventory check is a directory listing (∝ shard files —
  * metadata, never data); the state table is ∝ gap-window-active
  * users; and the sealing scan is ∝ candidate users' history, pruned
  * to their `ub` dirs. Nothing here scales with stream lifetime
  * except the immutable landed log itself. */
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
    gcActiveGens(fs, root, keep = Some(gen))
  }

  // ------------------------------------------ active-user state table

  private def activeDir(root: String, gen: Long) = s"$root/_active/b$gen"

  private def activeGens(fs: Fs, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root, "_active")
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("b"))
      .map(_.stripPrefix("b").toLong).toSeq.sorted
  }

  /** Delete active-table generations other than `keep` (the newest
    * ledgered one) — stray generations are a crashed attempt's. */
  private def gcActiveGens(fs: Fs, root: String,
                           keep: Option[Long]): Unit =
    activeGens(fs, root).filterNot(keep.contains).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(activeDir(root, g)), true)
    }

  /** The ledgered active-user rows (user_id, last_t) — gap-window
    * bounded. Empty before the first commit. */
  private def readActive(spark: org.apache.spark.sql.SparkSession,
                         fs: Fs, root: String,
                         st: State): DataFrame = {
    val gen = if (st.batches.isEmpty) None
              else Some(st.batches.maxBy(_._1)._1)
    gen.filter(g => fs.exists(
        new org.apache.hadoop.fs.Path(activeDir(root, g)))) match {
      case Some(g) => spark.read.parquet(activeDir(root, g))
      case None => spark.range(0)
        .select(col("id").as("user_id"), col("id").as("last_t"))
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
                 checkpointDir: String, userBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSealedBatch(batch, batchId, root, budgetBytes,
          userBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** One micro-batch of the sealed export (factored out for the
    * gated query and the crash drills). `userBuckets` is the `ub`
    * landing fan-out — it must stay CONSTANT for the life of a store
    * (it is a physical dir layout, like a bucket count). */
  def processSealedBatch(batch: DataFrame, batchId: Long, root: String,
                         budgetBytes: Long,
                         userBuckets: Int = 16): Unit = {
    require(userBuckets >= 1,
      s"userBuckets must be >= 1, got $userBuckets")
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
    // written there. A stray _active generation (written but never
    // ledgered) heals the same way.
    val parts = listParts(fs, outPath)
    val stray = parts.keySet -- st.files.keySet
    stray.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(outPath, f), false)
    }
    if ((parts -- stray) != st.files)
      throw new IllegalStateException(
        s"out dir at $outPath diverges from the ledgered inventory " +
          "beyond a crashed-suffix tear — refusing to repair")
    gcActiveGens(fs, root,
      keep = if (st.batches.isEmpty) None
             else Some(st.batches.maxBy(_._1)._1))
    // ONE pass over the (micro-batch-sized) batch: emptiness, the
    // batch watermark, and per-user maxima together
    val batchT = batch.select(col("user_id"),
        expr("ts div 1000").as("t"))
      .groupBy(col("user_id")).agg(max(col("t")).as("last_t"))
      .localCheckpoint(true)
    try {
      val bm = batchT.agg(max(col("last_t"))).head()
      if (bm.isNullAt(0) && st.batches.isEmpty)
        return // nothing ever landed: no watermark to advance
      // land the batch's events idempotently under their own
      // (bid, ub) dirs — ub makes the candidate-history read a
      // partition-pruned scan
      if (!bm.isNullAt(0))
        batch.withColumn("bid", lit(batchId))
          .withColumn("ub", pmod(col("user_id"), lit(userBuckets.toLong)))
          // one file per (bid, ub) dir: without the repartition every
          // input task writes a sliver into every ub dir it touches —
          // tasks × ub small files per batch, paid again on every
          // candidate-history read
          .repartition(userBuckets, col("ub"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bid", "ub").parquet(s"$root/_events")
      val wm = if (bm.isNullAt(0)) st.wm
               else math.max(st.wm, bm.getLong(0))
      processSealedTail(spark, fs, root, outPath, batchId, st, batchT,
        wm, budgetBytes, userBuckets)
    } finally {
      org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(batchT)
    }
  }

  /** Seal + export + publish, after the batch has landed. */
  private def processSealedTail(spark: org.apache.spark.sql.SparkSession,
                                fs: Fs, root: String, outPath: String,
                                batchId: Long, st: State,
                                batchT: DataFrame, wm: Long,
                                budgetBytes: Long,
                                userBuckets: Int): Unit = {
    val first = st.batches.isEmpty
    // candidates: every user who can own a session with last event in
    // (prev wm − gap, wm − gap] — the previously-active users plus
    // this batch's users; everyone else's sessions sealed (and
    // exported, or were dropped as sub-watermark late data) earlier
    val merged = readActive(spark, fs, root, st)
      .unionByName(batchT)
      .groupBy(col("user_id")).agg(max(col("last_t")).as("last_t"))
      .filter(if (first) lit(true) else col("last_t") > st.wm - Sft.GapUs)
      .localCheckpoint(true)
    try {
      val candUbs = merged
        .select(pmod(col("user_id"), lit(userBuckets.toLong)).as("ub"))
        .distinct().collect().map(_.getLong(0))
      // the pruned sealing scan: candidate users' FULL history (their
      // ub dirs only — a partition filter — then a semi-join down to
      // exactly them); rawTurns over a user's complete history assigns
      // the same session ids a whole-log recompute would. Sessionized
      // ONCE and checkpointed: the tail facts (newly sealed keys) and
      // the render both consume it — un-checkpointed, each would pay
      // the sessionization window cascade over the history again.
      val raw = Sft.rawTurns(
          spark.read.parquet(s"$root/_events")
            .filter(col("ub").isin(candUbs.toSeq: _*))
            .join(merged.select(col("user_id")), Seq("user_id"),
              "left_semi")
            .drop("bid", "ub"))
        .localCheckpoint(true)
      val lines = try {
        val newKeys = raw
          .groupBy(col("user_id"), col("session_id"))
          .agg(max(col("t")).as("lt"))
          .filter(col("lt") <= wm - Sft.GapUs &&
            (if (first) lit(true) else col("lt") > st.wm - Sft.GapUs))
          .select(col("user_id"), col("session_id"))
        val esc = (c: org.apache.spark.sql.Column) =>
          regexp_replace(c, "([\"\\\\])", "\\\\$1")
        // the sealed-keys semi-join lands BELOW the merge/render
        // windows: only newly sealed conversations' events flow
        // through turn merging and templating (candidates that stay
        // open render nothing this tick). One materialization:
        // writeLines evaluates its input twice and the byte total is
        // read once more.
        Sft.render(Sft.mergedTurnsOfRaw(
            raw.join(newKeys, Seq("user_id", "session_id"),
              "left_semi")))
          .select(
            (col("user_id") * 1000000L + col("session_id")).as("ck"),
            concat(lit("{\"ck\":"),
              col("user_id") * 1000000L + col("session_id"),
              lit(",\"render\":\""), esc(col("rendered")), lit("\"}"))
              .as("line"))
          .withColumn("n_bytes", (length(col("line")) + 1L).cast("long"))
          .localCheckpoint(true)
      } finally {
        org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(raw)
      }
      try {
        Lakehouse.writeLines(lines, "ck", outPath, budgetBytes,
          byteOffset = st.landed, mode = SaveMode.Append)
        val add = lines.agg(coalesce(sum(col("n_bytes")), lit(0L)))
          .head().getLong(0)
        // publish: active table generation first (still unreferenced —
        // a crash here leaves a stray the next attempt heals), then
        // the state file that names it
        merged.filter(col("last_t") > wm - Sft.GapUs)
          .coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(activeDir(root, batchId))
        writeState(fs, root, batchId,
          State(st.batches :+ ((batchId, wm, st.landed + add)),
            listParts(fs, outPath)))
      } finally {
        org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(lines)
      }
    } finally {
      org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(merged)
    }
  }
}
