package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgbDataSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val staDir = "/root/reference/tests/test_files/STA"
  private val oneFile = s"$staDir/Ford_3FMT_Carpet_STA_N2_10K_240603_R1.ngb-ss3"

  test("format(\"ngb\") reads a single file with aligned channel names") {
    val df = spark.read.format("ngb").load(oneFile)
    assert(df.columns.contains("time"))
    assert(df.columns.contains("temperature"))
    assert(df.count() == 8001)
  }

  test("directory load unions all ngb files, one partition per file") {
    val df = spark.read.format("ngb").load(staDir)
    // 4 ss3 + 2 bs3 files: 23835 + 8001 + 8001 + 4601 + 8001 + 23835
    assert(df.count() == 23835L + 8001 + 8001 + 4601 + 8001 + 23835)
    assert(df.rdd.getNumPartitions == 6)
  }

  test("column pruning reaches the reader (only selected channels decode)") {
    val df = spark.read.format("ngb").load(oneFile).select("time", "dsc")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("time") && !scan.contains("purge_flow"), scan.take(1000))
    // aligned values match the corrected driver API
    val viaApi = graft.sources.NgbSource.load(spark, oneFile, aligned = true)
      .df.select("time", "dsc").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val viaV2 = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(viaV2.sameElements(viaApi))
  }

  test("multi-path load (Spark passes 'paths', not 'path') unions both") {
    val other = s"$staDir/Hyundai_KM8K_Carpet_STA_N2_10K_240711_R3.ngb-ss3"
    val df = spark.read.format("ngb").load(oneFile, other)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() ==
      spark.read.format("ngb").load(oneFile).count() +
      spark.read.format("ngb").load(other).count())
  }

  test("pathless load fails with a clear message, not an NPE") {
    val e = intercept[Exception](spark.read.format("ngb").load())
    assert(e.getMessage.contains("ngb: no path given"), e.getMessage)
  }

  test("aggregation over the v2 source matches driver-side load") {
    val v2sum = spark.read.format("ngb").load(oneFile)
      .agg(sum("temperature")).head().getDouble(0)
    val apiSum = graft.sources.NgbSource.load(spark, oneFile, aligned = true)
      .df.agg(sum("temperature")).head().getDouble(0)
    assert(v2sum == apiSum)
  }
}
