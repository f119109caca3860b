package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UserJourneys

/** [[UserJourneys]] invariants that the oracle's value-equality can't
  * express: funnel monotonicity, SCD2 timeline reconstruction, cohort
  * mass conservation. */
class UserJourneysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def events = Tables.t(spark, "/root/testdata/sf0.001", "events")

  test("funnel: step counts are monotonically non-increasing and step 1 " +
    "is the qualifying-user count") {
    val f = UserJourneys.funnel(events, "user_id", "ts",
      Seq("view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")),
      windowNs = 3600L * 1000 * 1000 * 1000)
      .orderBy(col("step")).as[(Long, String, Long)].collect()
    assert(f.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(f.sliding(2).forall { case Array(a, b) => b._3 <= a._3 })
    val viewers = events.filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(f.head._3 == viewers)
  }

  test("scd2States reconstructs the stream: every event's type equals " +
    "the state of the SCD2 range covering its timestamp; ranges tile " +
    "each user's timeline with no gaps or overlaps") {
    val scd = UserJourneys.scd2States(events, "user_id", "ts",
      "event_type", "event_id")
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"))
      .as[(Long, String, Long, Option[Long])].collect()
      .groupBy(_._1).map { case (u, rs) => u -> rs.sortBy(_._3) }
    scd.values.foreach { rs =>
      // contiguous: each range closes exactly where the next opens
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(rs.last._4.isEmpty) // current state is open-ended
    }
    val evs = events.select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, String)].collect()
    evs.foreach { case (u, ts, tpe) =>
      val covering = scd(u).filter(r =>
        r._3 <= ts && r._4.forall(ts < _))
      assert(covering.map(_._2).distinct.toSeq == Seq(tpe),
        s"user $u ts $ts: $covering vs $tpe")
    }
  }

  test("scd2Fold == from-scratch, and untouched users PASS THROUGH " +
    "rather than being recomputed (a corrupted standing row survives " +
    "the fold — recomputation could never reproduce it)") {
    val cut = 1706140800000000000L
    val standing = UserJourneys.scd2States(
      events.filter(col("ts") < cut), "user_id", "ts",
      "event_type", "event_id").localCheckpoint(true)
    val batch = events.filter(col("ts") >= cut)
    val folded = UserJourneys.scd2Fold(standing, batch, "user_id", "ts",
      "event_type", "event_id")
    val scratch = UserJourneys.scd2States(events, "user_id", "ts",
      "event_type", "event_id")
    assert(folded.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(folded).isEmpty)
    // trust-not-recompute: make one user untouched BY CONSTRUCTION
    // (drop them from the batch) and corrupt their standing rows
    val u = standing.select(min(col("user_id"))).as[Long].collect()(0)
    val batchExcl = batch.filter(col("user_id") =!= u)
    val corrupted = standing.withColumn("valid_from",
      when(col("user_id") === u, col("valid_from") + 1000L)
        .otherwise(col("valid_from")))
    val refolded = UserJourneys.scd2Fold(corrupted, batchExcl, "user_id",
      "ts", "event_type", "event_id")
    val got = refolded.filter(col("user_id") === u)
      .select(col("valid_from")).as[Long].collect().sorted
    val want = standing.filter(col("user_id") === u)
      .select(col("valid_from")).as[Long].collect().map(_ + 1000L).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("cohortRetention: k=0 rows partition the user population") {
    val r = UserJourneys.cohortRetention(events, "user_id", "ts",
      dayNs = 86400L * 1000 * 1000 * 1000, maxK = 7)
      .as[(Long, Long, Long)].collect()
    val total = events.select(col("user_id")).distinct().count()
    assert(r.filter(_._2 == 0L).map(_._3).sum == total)
    // no retention bucket exceeds its cohort's size
    val size = r.filter(_._2 == 0L).map(x => x._1 -> x._3).toMap
    r.foreach { case (c, _, u) => assert(u <= size(c)) }
  }
}
