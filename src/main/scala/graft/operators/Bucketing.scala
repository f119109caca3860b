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

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * downstream sort-merge joins also skip the per-partition sort). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // an orphaned managed-table dir (prior session, in-memory catalog
    // gone) still blocks CREATE — clear it
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir
  }

  /** Join two same-key bucketed tables — plans with no Exchange. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
