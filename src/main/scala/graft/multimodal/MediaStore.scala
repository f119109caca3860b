package graft.multimodal

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The physical ACT tier for multimodal dedup — where the detect
  * tables ([[VideoDedup.nearDupGroups]] over any (media_id,
  * frame_idx, fhash) substrate) become file operations, the way the
  * text family's shard writer does for token sequences. A corpus of
  * media rows lives in a BUCKETED store (`path/bucket=N` parquet
  * dirs, bucket = media_id mod buckets); applying a keep-one verdict
  * rewrites ONLY the buckets that actually contain a deleted row
  * (dynamic partition overwrite — the [[graft.operators.Packing
  * .repairSealedShards]] delete discipline), deletes buckets the
  * verdict emptied, and leaves every other bucket's files
  * byte-identical and mtime-untouched (spec-pinned). Repair cost is
  * ∝ flagged buckets by construction, never the corpus.
  *
  * The bucket count is the parallelism/pruning knob: at 100 TB a
  * bucket is the unit of rewrite I/O and of manifest accounting, so
  * it should be sized like a shard (≈ executor-memory work units),
  * not like a hash-join bucket. */
object MediaStore {

  private def bucketed(media: DataFrame, idCol: String, buckets: Int) =
    media.withColumn("bucket", pmod(col(idCol), lit(buckets.toLong)))

  /** Materialize the full corpus into the bucketed store layout. */
  def writeAll(media: DataFrame, idCol: String, path: String,
               buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    bucketed(media, idCol, buckets)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(path)
  }

  /** Append an ingest batch into an existing store: new rows land as
    * additional part files inside their bucket dirs; no existing file
    * is opened or rewritten. Work ∝ batch. */
  def append(media: DataFrame, idCol: String, path: String,
             buckets: Int): Unit =
    bucketed(media, idCol, buckets)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(idCol))
      .write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(path)

  /** Apply a keep-one delete set to a [[writeAll]] store: every
    * bucket containing a deleted media_id is rewritten without those
    * rows (dynamic overwrite), buckets emptied by the verdict are
    * deleted outright, and no other bucket is opened, rewritten, or
    * touched. `deletions` is one id column (`idCol`) — the
    * non-keepers of a [[VideoDedup.groupsFromState]] /
    * [[VideoDedup.nearDupGroups]] verdict; it is collected only as a
    * broadcast id set, never materialized driver-side beyond that. */
  def applyKeepOne(spark: SparkSession, path: String, deletions: DataFrame,
                   idCol: String): Unit = {
    val old = spark.read.parquet(path)
      .withColumn("bucket", col("bucket").cast("long"))
    val delIds = deletions.select(col(idCol))
    val flagged = old.join(broadcast(delIds), Seq(idCol), "left_semi")
      .select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    if (flagged.isEmpty) return
    // Materialize BEFORE the overwrite: the rewrite job must not scan
    // the very directories it replaces. Bounded by the flagged set.
    val keep = old.filter(col("bucket").isin(flagged.toSeq: _*))
      .join(broadcast(delIds), Seq(idCol), "left_anti")
      .localCheckpoint(true)
    keep.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(path)
    val emptied = flagged --
      keep.select(col("bucket")).distinct().collect().map(_.getLong(0))
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"bucket=$b"), true)
      }
    }
  }

  /** Per-bucket manifest over a READ-BACK store frame (computing it
    * from the files is what proves the materialization): row count
    * and an order-independent id digest — the structural fields both
    * engines can derive, so the manifest goes through the oracle
    * gate. Byte-level content identity is pinned separately by the
    * store spec (content is codec output, not SQL-derivable). */
  def manifest(store: DataFrame, idCol: String): DataFrame =
    store
      .withColumn("__h",
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_media"),
        expr("bit_xor(__h)").as("ids_digest"))
}
