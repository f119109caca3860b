package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main (not part of the driver contract): prints
  * formatted plans for the queries named in SPARK_GRAFT_AUDIT. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = sys.env.getOrElse("SPARK_GRAFT_AUDIT", "").split(",")
      .map(_.trim).filter(_.nonEmpty)
    names.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
