package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Lakehouse

/** Streaming CHANGE-DATA-FEED SUBSCRIBER: a downstream replica table
  * that tails a versioned store and applies its diffs incrementally —
  * the pull half of the CDF contract (q364 proved the batch form; this
  * is the standing subscription).
  *
  * Per tick (the trigger payload is ignored — every tick is "catch up
  * to the source head"): probe the SOURCE manifest head (manifest-only
  * — metadata, never data), and for each unapplied version v apply
  * `diffVersionsFull(v-1, v)` to the replica as a merge batch
  * (`removed -> D`, else U with the post-image payload) through the
  * bucket-pruned [[Lakehouse.mergeInto]]. Read cost per version ∝
  * pointer-differing buckets (the CDF pruning), apply cost ∝ the
  * diff's candidate buckets — a quiet tick costs one manifest probe.
  *
  * Replay class: IDEMPOTENT, no ledger needed for correctness —
  * applying the same diff twice replaces rows with themselves and
  * re-deletes absent keys (the replace-by-key class: CDC snapshot,
  * BM25 upsert). The `_graft_cdf_applied` progress marker
  * (complete-or-absent via temp+rename) exists so a replay or quiet
  * tick SHORT-CIRCUITS without re-reading diffs, and so a crash
  * between a merge and its marker publish re-applies at most that one
  * version's diff — harmlessly, by idempotence. Schema evolution
  * rides through: the diff carries the union schema, and the merge's
  * evolution path widens the replica. */
object StreamingReplica {

  private val Marker = "_graft_cdf_applied"

  private type Fs = org.apache.hadoop.fs.FileSystem

  private def fsOf(df: DataFrame, path: String): Fs =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** The replica's applied-version marker; None before the first
    * apply (bootstrap pending). */
  def appliedVersion(spark: org.apache.spark.sql.SparkSession,
                     replica: String): Option[Long] = {
    val fs = new org.apache.hadoop.fs.Path(replica)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(replica, Marker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .trim.toLong)
      finally in.close()
    }
  }

  private def publishApplied(fs: Fs, replica: String, v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(replica, Marker)
    val tmp = new org.apache.hadoop.fs.Path(replica, Marker + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"marker publish failed at $p")
  }

  /** One subscriber tick (factored out for the gated query and the
    * drills): catch the replica up to the source head. Bootstrap (no
    * marker yet) snapshots the source at `bootstrapVersion` into a
    * fresh plain store — after which every later version arrives as a
    * diff. Returns the number of versions applied this tick (0 = the
    * replica was already at head). */
  def processTick(spark: org.apache.spark.sql.SparkSession,
                  srcPath: String, replica: String, key: String,
                  buckets: Int, bootstrapVersion: Long = 0L): Long = {
    val fs = new org.apache.hadoop.fs.Path(replica)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val head = Lakehouse.readManifest(spark, srcPath)
      .agg(max(when(col("bucket") =!= -1L, col("version"))))
      .head().getLong(0)
    var applied = appliedVersion(spark, replica) match {
      case Some(v) => v
      case None =>
        Lakehouse.writeStore(
          Lakehouse.readVersioned(spark, srcPath, bootstrapVersion)
            .drop("bucket"),
          key, replica, buckets)
        publishApplied(fs, replica, bootstrapVersion)
        bootstrapVersion
    }
    var n = 0L
    while (applied < head) {
      val v = applied + 1
      val cdf = Lakehouse.diffVersionsFull(spark, srcPath, applied, v,
        key)
      val dataCols = cdf.columns
        .filterNot(c => c == "bucket" || c == key || c == "change")
      val mb = cdf.select(
        (col(key) +: when(col("change") === "removed", lit("D"))
          .otherwise(lit("U")).as("op") +: dataCols.map(col)): _*)
      Lakehouse.mergeInto(spark, replica, mb, key, buckets)
      publishApplied(fs, replica, v)
      applied = v
      n += 1
    }
    n
  }

  /** The subscriber as a standing streaming sink: any trigger stream
    * drives the poll loop (the batch content is ignored — arrival IS
    * the signal). */
  def subscriberSink(ticks: DataFrame, srcPath: String, replica: String,
                     key: String, buckets: Int, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ticks.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processTick(batch.sparkSession, srcPath, replica, key, buckets)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
