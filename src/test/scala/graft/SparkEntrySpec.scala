package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == operators.RelationalQueries.rowsOnly,
      s"queries missing oracle SQL: $noOracle")
  }

  test("all queries run non-empty on sf0.001 (except anti-join which may be empty)") {
    val mayBeEmpty = Set("q14_anti_join")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 matches hand-computed group count") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    assert(df.columns.toSet.contains("sum_qty"))
    assert(df.count() <= 9) // at most |returnflag| x |linestatus|
  }

  test("q04 topk is ordered desc") {
    val rows = SparkEntry.queries("q04_topk")(spark, sf).collect()
    val prices = rows.map(_.getAs[Double]("price"))
    assert(rows.length == 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }
}
