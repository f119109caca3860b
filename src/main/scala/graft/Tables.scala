package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading over the driver-provided synthetic parquet dirs
  * (/root/repo/TESTDATA.md). All queries take a `sfDir` and resolve
  * tables through here so scans stay uniform (columnar parquet,
  * vectorized reader, filter/column pushdown handled by Catalyst).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is parquet INT64 TIMESTAMP(NANOS) — Spark has no
      // nanosecond TimestampType, so read it as raw INT64 nanoseconds
      // (exact parity with DuckDB's epoch_ns on the oracle side).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
