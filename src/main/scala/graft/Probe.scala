package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: schema/read probes against the synthetic testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    try {
      val e = spark.read.parquet(s"$dir/events.parquet")
      e.printSchema()
      e.show(3, false)
    } catch {
      case ex: Throwable =>
        println(s"plain read failed: ${ex.getMessage}")
        val spark2 = spark.newSession()
        spark2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val e2 = spark2.read.parquet(s"$dir/events.parquet")
        e2.printSchema()
        e2.show(3, false)
    }
    val em = spark.read.parquet(s"$dir/embeddings.parquet")
    em.printSchema()
    val o = spark.read.parquet(s"$dir/orders.parquet")
    o.printSchema()
    spark.stop()
  }
}
