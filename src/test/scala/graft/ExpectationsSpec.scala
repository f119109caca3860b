package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations
import graft.operators.Expectations._

/** [[Expectations]] semantics: null predicates count as violations,
  * uniqueness counts rows beyond the first per key, FK counts
  * orphans, and the whole suite reports one row per rule. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(rules: Seq[Rule]) = {
    val df = Seq(
      (1L, Some(5.0), "A"), (2L, Some(500.0), "A"),
      (2L, None, "Z"), (3L, Some(1.0), "N")
    ).toDF("k", "v", "flag")
    Expectations.evaluate(df, rules)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("null predicate counts as a violation; accepted-values and " +
    "range rules count exactly") {
    val got = report(Seq(
      RowRule("v_range", col("v") < 0 || col("v") > 100),
      RowRule("flag_ok", !col("flag").isin("A", "N"))))
    // v=500 violates; v=null is a NULL predicate -> conservative
    // violation; 5.0 and 1.0 pass
    assert(got("v_range") == ((4L, 2L, false)))
    assert(got("flag_ok") == ((4L, 1L, false)))
  }

  test("uniqueness counts rows beyond the first per key; FK counts " +
    "orphans against a distinct parent projection") {
    val parent = Seq(1L, 3L).toDF("pk")
    val got = report(Seq(
      UniqueRule("k_unique", Seq("k")),
      FkRule("k_fk", Seq("k"), parent, Seq("pk"))))
    assert(got("k_unique") == ((4L, 1L, false))) // k=2 twice
    assert(got("k_fk") == ((4L, 2L, false)))     // both k=2 rows orphan
  }

  test("incremental fold: a batch parent RESCUES a standing orphan " +
    "even when no batch child shares the key; duplicate keys " +
    "straddling batches are caught") {
    val rulesFor = (p: org.apache.spark.sql.DataFrame) => Seq[Rule](
      RowRule("neg", col("x") < 0),
      UniqueRule("k_unique", Seq("k")),
      FkRule("k_fk", Seq("k"), p, Seq("pk")))
    val oldChild = Seq((1L, 5L), (2L, -1L)).toDF("k", "x")
    val oldParent = Seq(1L).toDF("pk")          // k=2 is an orphan
    val batchChild = Seq((1L, 7L), (3L, 2L)).toDF("k", "x")
    val batchParent = Seq(2L, 3L).toDF("pk")    // rescues k=2
    val oldSt = Expectations.state(oldChild, rulesFor(oldParent))
    // standing state really holds the orphan before the fold
    assert(oldSt("k_fk").filter(!col("matched")).count() == 1L)
    val folded = Expectations.foldStates(oldSt,
      Expectations.state(batchChild, rulesFor(batchParent)),
      rulesFor(oldParent))
    val got = Expectations.report(folded, rulesFor(oldParent))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("k_fk") == ((4L, 0L, true)))     // orphan rescued
    assert(got("neg") == ((4L, 1L, false)))
    assert(got("k_unique") == ((4L, 1L, false))) // k=1 in both batches
    // and the fold == one-shot evaluate over the union
    val oneShot = Expectations.evaluate(oldChild.unionByName(batchChild),
        rulesFor(oldParent.unionByName(batchParent)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == oneShot)
  }

  test("an all-green suite passes and n_checked covers every row") {
    val got = report(Seq(
      RowRule("k_not_null", col("k").isNull),
      UniqueRule("kv_unique", Seq("k", "flag"))))
    assert(got("k_not_null") == ((4L, 0L, true)))
    assert(got("kv_unique") == ((4L, 0L, true)))
  }
}
