package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: the shuffle-free co-located join path
  * (SURVEY.md §2.5 scale notes; NOTES round-1 item 7).
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle.
  * Writing both sides bucketed by the join key — same column, same
  * bucket count — pins co-location at WRITE time: Spark's scan
  * reports HashPartitioning(key, n) per bucket table, EnsureRequirements
  * sees both sides already distributed correctly, and the sort-merge
  * join runs with ZERO exchanges. The write costs one shuffle each,
  * amortized over every subsequent join/aggregation on that key.
  */
object Bucketing {

  /** Drop `table` AND its warehouse directory. An orphaned
    * managed-table dir (prior session, in-memory catalog gone) blocks
    * a later CREATE even after DROP TABLE — and the warehouse need not
    * be a local filesystem, so the cleanup goes through the Hadoop
    * `FileSystem` resolved from the warehouse URI (HDFS/S3A/file all
    * behave; a `java.io.File` delete would silently no-op off-local). */
  def dropManagedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * downstream sort-merge joins also skip the per-partition sort). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets)

  /** [[writeBucketed]] over a COMPOSITE key (e.g. the two-level IVF's
    * (list_id, fine_id)): the scan reports HashPartitioning over all
    * key columns, so an equi-join on the full key set still reaches
    * the table with zero exchanges. */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                        buckets: Int): Unit = {
    require(keys.nonEmpty, "at least one bucketing key required")
    val spark = df.sparkSession
    dropManagedTable(spark, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir
  }

  /** The bucket id Spark's writer assigns a row: pmod(murmur3(key),
    * buckets). Repartitioning on THIS expression (not on the key)
    * guarantees each bucket's rows sit wholly inside one task, so a
    * bucketed write emits exactly one file per non-empty bucket.
    * Repartitioning on the key does NOT guarantee that: when the
    * input is itself a bucketed scan the planner may drop the
    * "redundant" exchange, and if the scan then degrades to plain
    * file-split partitions a bucket spans tasks and the writer emits
    * one file per (task, bucket) — the compaction spec caught exactly
    * this. Hashing the bucket id makes the partitioning provably
    * different from any scan layout, so the shuffle always runs. */
  def bucketIdExpr(key: String, buckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    pmod(hash(col(key)), lit(buckets))
  }

  /** Join two same-key bucketed tables — plans with no Exchange. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
