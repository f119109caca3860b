package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Ingest-batch store with FILE-LEVEL COLUMN STATS — the Delta/
  * Iceberg data-skipping mechanic in plain parquet. Each ingest batch
  * lands under `path/batch=<id>/bucket=<k>` (batch OUTER so batch
  * pruning prunes whole top-level dirs) and appends one stats row per
  * (batch, bucket, stat column) to `path/_stats`: min/max computed
  * from the batch frame BEFORE it lands, so stats cost no re-read. A
  * range scan consults `_stats` first (metadata-sized: batches ×
  * buckets × columns rows) and opens only batches whose [min, max]
  * intersects the predicate.
  *
  * Where this pays at 100 TB: columns CORRELATED WITH ARRIVAL —
  * event timestamps, monotone ids, ingest days. A year of ingest
  * batches answers a one-day range by opening ~one batch's dirs; the
  * bucket-mod layout alone can never prune that (a key-mod bucket
  * holds keys across the whole time range, so per-BUCKET stats are
  * vacuous on time — the batch axis is the one that clusters). The
  * complement of the versioned store's pointer pruning: that prunes
  * on KEY identity, this prunes on VALUE ranges.
  *
  * Stats values are stored as LONG: numeric columns cast, timestamp
  * columns as `unix_micros` (exact, no truncation ambiguity — and
  * the cross-engine pair of DuckDB's `epoch_us`). */
object StatsStore {

  private def statLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }

  /** Land one ingest batch: rows under `path/batch=<id>/bucket=<k>`
    * (one file per bucket — repartitioned on bucket, sorted by key
    * within), stats rows appended to `path/_stats`. `batch` ids must
    * be unique per ingest (the caller's ledger discipline — reusing
    * one would interleave files inside a batch dir and double its
    * stats rows). */
  def appendBatch(df: DataFrame, key: String, path: String,
                  buckets: Int, batch: Long,
                  statCols: Seq[String]): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(statCols.nonEmpty, "statCols must name at least one column")
    val b = df
      .withColumn("bucket", pmod(col(key), lit(buckets.toLong)))
      .withColumn("batch", lit(batch))
      .localCheckpoint(true) // one evaluation feeds write AND stats
    b.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Append)
      .partitionBy("batch", "bucket")
      .parquet(path)
    statCols.map { c =>
      b.groupBy(col("bucket").cast("long").as("bucket"))
        .agg(min(statLong(b, c)).as("min_v"),
          max(statLong(b, c)).as("max_v"),
          count(lit(1)).as("n_rows"))
        .select(lit(batch).as("batch"), col("bucket"),
          lit(c).as("col_name"), col("min_v"), col("max_v"),
          col("n_rows"))
    }.reduce(_ unionByName _)
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(s"$path/_stats")
  }

  /** The batches a `[lo, hi]` range on `statCol` can possibly hit:
    * batches with ANY (batch, bucket) stats row whose [min_v, max_v]
    * intersects the range. Metadata-only (reads `_stats`, never
    * data); the pruning evidence a caller can surface next to the
    * scan. */
  def rangeBatches(spark: SparkSession, path: String, statCol: String,
                   lo: Long, hi: Long): Seq[Long] =
    spark.read.parquet(s"$path/_stats")
      .filter(col("col_name") === statCol &&
        col("max_v") >= lo && col("min_v") <= hi)
      .select(col("batch")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  /** Range scan with stats skipping: only batches [[rangeBatches]]
    * admits are opened (a partition filter on the batch dir — dirs of
    * skipped batches are never listed past the top level), buckets
    * within a surviving batch prune the same way off the per-bucket
    * stats rows, and the row-level range predicate still applies on
    * top (stats admit false positives by design, never false
    * negatives). */
  def readRange(spark: SparkSession, path: String, statCol: String,
                lo: Long, hi: Long): DataFrame = {
    val st = spark.read.parquet(s"$path/_stats")
      .filter(col("col_name") === statCol &&
        col("max_v") >= lo && col("min_v") <= hi)
      .select(col("batch"), col("bucket")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val base = spark.read.parquet(path)
    if (st.isEmpty) return base.filter(lit(false))
    val batches = st.map(_._1).distinct.toSeq
    val bks = st.map(_._2).distinct.toSeq
    val pruned = base
      .filter(col("batch").isin(batches: _*) &&
        col("bucket").isin(bks: _*))
    // the row predicate in the column's NATIVE type so it pushes into
    // the parquet scan (a unix_micros() wrapper would evaluate
    // post-scan); unix_micros is monotone, so the bounds map exactly
    val rowPred = pruned.schema(statCol).dataType match {
      case TimestampType =>
        col(statCol).between(timestamp_micros(lit(lo)),
          timestamp_micros(lit(hi)))
      case _ => col(statCol).cast("long").between(lo, hi)
    }
    pruned.filter(rowPred)
  }
}
