package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Sketches}

/** The delete-fold family: [[Dedup.decrementalComponents]] must equal
  * a from-scratch CC over the survivors while leaving untouched
  * components' rows EXACTLY as they were (the work-scoping contract),
  * and [[Sketches.cmsSubtractCells]] must be the exact inverse of the
  * linear merge.
  */
class DeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): DataFrame =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select(col("id"), col("keep_id")).as[(Long, Long)]
      .collect().toMap

  // graph: path 1-2-3 (deleting 2 splits it; 1 and 3 lose their only
  // edges and drop out), square 4-5-6-7-4 (deleting 4 leaves the path
  // 5-6-7 relabeled to min 5), clique 8-9-10 untouched.
  private val pairs = Seq((1L, 2L), (2L, 3L),
    (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L),
    (8L, 9L), (9L, 10L), (8L, 10L))

  test("decrementalComponents == from-scratch CC over survivors: " +
    "splits, keeper reassignment, edge-less survivors dropped") {
    val standing = labelsOf(pairs)
    val got = asMap(Dedup.decrementalComponents(standing,
      pairs.toDF("id_a", "id_b"), Seq(2L, 4L).toDF("id")))
    val survivors = pairs.filter { case (a, b) =>
      a != 2L && b != 2L && a != 4L && b != 4L
    }
    assert(got == asMap(labelsOf(survivors)))
    // the split path's ends dropped (no surviving edges); the square
    // relabeled to its new minimum
    assert(!got.contains(1L) && !got.contains(3L))
    assert(got(5L) == 5L && got(7L) == 5L)
  }

  test("untouched components keep their EXACT old rows (the clique " +
    "never enters the recompute)") {
    val standing = labelsOf(pairs)
    val oldRows = asMap(standing).filter { case (id, _) => id >= 8L }
    val got = asMap(Dedup.decrementalComponents(standing,
      pairs.toDF("id_a", "id_b"), Seq(2L).toDF("id")))
    assert(got.filter { case (id, _) => id >= 8L } == oldRows)
  }

  test("deleting the component MINIMUM (the keeper itself) relabels " +
    "the remainder; deleting a whole component erases it") {
    val standing = labelsOf(pairs)
    val got = asMap(Dedup.decrementalComponents(standing,
      pairs.toDF("id_a", "id_b"), Seq(1L, 8L, 9L, 10L).toDF("id")))
    // path lost node 1: (2,3) survive, keeper moves to 2
    assert(got(2L) == 2L && got(3L) == 2L)
    assert(!got.contains(8L) && !got.contains(9L) && !got.contains(10L))
    // square untouched
    assert(got(4L) == 4L && got(6L) == 4L)
  }

  test("trust-not-recompute: a corrupted label on an UNTOUCHED " +
    "component carries through the decremental fold verbatim — " +
    "recomputation could never reproduce it") {
    val standing = labelsOf(pairs).withColumn("keep_id",
      when(col("id") >= 8L, lit(777L)).otherwise(col("keep_id")))
    val got = asMap(Dedup.decrementalComponents(standing,
      pairs.toDF("id_a", "id_b"), Seq(2L).toDF("id")))
    assert(got(8L) == 777L && got(9L) == 777L && got(10L) == 777L)
  }

  test("empty delete set is the identity") {
    val standing = labelsOf(pairs)
    val got = asMap(Dedup.decrementalComponents(standing,
      pairs.toDF("id_a", "id_b"), Seq.empty[Long].toDF("id")))
    assert(got == asMap(standing))
  }

  test("Cdc: tombstone retention blocks resurrection by a late " +
    "out-of-order upsert; dropping the tombstone would not") {
    import graft.operators.Cdc
    // key 1: upsert@1, delete@3; the late batch carries upsert@2
    val standingLog = Seq((1L, 1L, "U", "a"), (1L, 3L, "D", "x"),
      (2L, 1L, "U", "b"))
    val late = Seq((1L, 2L, "U", "c"))
    def df(rows: Seq[(Long, Long, String, String)]) =
      rows.toDF("k", "seq", "op", "payload")
    val standing = Cdc.snapshot(df(standingLog), "k", Seq("seq"), "op",
      Seq("payload"))
    val folded = Cdc.fold(standing, df(late), "k", Seq("seq"), "op",
      Seq("payload"))
    val view = Cdc.readView(folded).as[(Long, Long, String)].collect()
    assert(view.toSet == Set((2L, 1L, "b"))) // key 1 stays deleted
    // the buggy fold (tombstones dropped before folding) resurrects
    val buggy = Cdc.fold(Cdc.readView(standing)
        .withColumn("op", lit("U")), df(late), "k", Seq("seq"), "op",
      Seq("payload"))
    assert(Cdc.readView(buggy).filter(col("k") === 1L).count() == 1L)
    // replaying the late batch is a no-op (idempotent max)
    val replayed = Cdc.fold(folded, df(late), "k", Seq("seq"), "op",
      Seq("payload"))
    assert(replayed.as[(Long, Long, String, String)].collect().toSet ==
      folded.as[(Long, Long, String, String)].collect().toSet)
  }

  test("StreamingRetrieval upsert: a replayed batch is a no-op and a " +
    "CHANGED document's postings replace the stale rows") {
    import graft.streaming.StreamingRetrieval.processPostingsBatch
    val table = "graft_test_postings_upsert"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    def tbl() = spark.table(table)
      .as[(Long, String, Double)].collect().toSet
    processPostingsBatch(Seq((1L, "a b a"), (2L, "c")).toDF("doc_id", "text"),
      "doc_id", "text", table)
    val first = tbl()
    assert(first == Set((1L, "a", 2.0), (1L, "b", 1.0), (2L, "c", 1.0)))
    // replay: identical batch collapses
    processPostingsBatch(Seq((1L, "a b a"), (2L, "c")).toDF("doc_id", "text"),
      "doc_id", "text", table)
    assert(tbl() == first)
    // update: doc 1's text changed — stale rows must vanish
    processPostingsBatch(Seq((1L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", table)
    assert(tbl() == Set((1L, "x", 1.0), (2L, "c", 1.0)))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("cmsSubtractCells inverts the merge exactly and restores the " +
    "sparse representation (no zero cells)") {
    def sk(rows: Seq[(String, Long)]) =
      Sketches.cmsSketch(rows.toDF("w", "c"), "w", "c",
        depth = 4, width = 16)
    val full = Seq(("a", 5L), ("b", 3L), ("c", 2L))
    val del = Seq(("b", 3L), ("c", 1L))
    val remain = Seq(("a", 5L), ("c", 1L))
    val folded = Sketches.cmsSubtractCells(sk(full), sk(del))
    def cells(df: DataFrame) =
      df.as[(Int, Long, Long)].collect().toSet
    assert(cells(folded) == cells(sk(remain)))
    // 'b' vanished entirely: its cells (where no survivor collides)
    // must be ABSENT, not zero
    assert(folded.filter(col("cell") === 0L).count() == 0L)
  }
}
