package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

/** Pins the attach-in-place prefix-sum family (prefixAttach /
  * withStableIds / packAttach) to the join-back path it replaced —
  * including the r16 regression shape: at key spans near 2^57 the
  * equal-width bucket expression divides as DOUBLE, and the top key's
  * quotient can round up into bucket nB (one past the last). phase2
  * always indexed the full nB+1-entry scanLeft offsets array, so the
  * spillover bucket worked; prefixAttach's element_at over a truncated
  * nB-entry array threw under ANSI (q359_epoch_shuffle returned 0 rows
  * vs the oracle's 1302). The overflow is parallelism-dependent — the
  * bucket count is defaultParallelism — so these specs pin it at TWO
  * bucket counts via the pinned-nBuckets probe (two SparkContexts with
  * different local[n] masters cannot coexist in one test JVM). */
class PackingAttachSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The exact double-division bucket expression bucketing() uses. */
  private def eqBucket(id: Long, minId: Long, span: Long): Long =
    ((id - minId).toDouble / span.toDouble).toLong

  /** Smallest max-key D >= 2^57 whose top key rounds into the phantom
    * bucket nB under equal-width bucketing of [0, D]. */
  private def phantomSpan(nB: Int): Long = {
    var d = 1L << 57
    while ({
      val span = math.max(1L, d / nB + 1)
      eqBucket(d, 0L, span) < nB
    }) d += 1
    d
  }

  test("withStableIds survives the phantom overflow bucket at two bucket counts") {
    for (nB <- Seq(3, 7)) {
      val d = phantomSpan(nB)
      val span = math.max(1L, d / nB + 1)
      // the shape must actually be the overflow edge, or the test is vacuous
      assert(eqBucket(d, 0L, span) == nB,
        s"expected top key to round into phantom bucket $nB")
      // n=3 < 4*nB keeps the skew gate closed: equal-width path pinned
      val df = spark.createDataFrame(
        Seq((0L, "a"), (d / 2, "b"), (d, "c"))).toDF("key", "payload")
      val got = Packing.withStableIdsAt(df, "key", nB)
        .select("key", "row_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1)
      assert(got.toSeq == Seq((0L, 0L, "a"), (d / 2, 1L, "b"), (d, 2L, "c")),
        s"nB=$nB d=$d: ${got.toSeq}")
    }
  }

  /** The q359 key shape: epoch-major composite keys spanning ~2^57.5
    * (epoch·2^56 + 40-bit hash·2^16 + seq). Equivalence to the
    * rank-on-keys-then-join-back path must hold at the session's
    * defaultParallelism AND at pinned bucket counts (output is
    * bucketing-invariant). */
  test("withStableIds == stableIds + join on epoch-major 2^56-span keys") {
    val rows = for {
      epoch <- 0L until 3L
      seq <- 0L until 100L
    } yield {
      val h = (seq * 2654435761L + epoch * 40503L) & ((1L << 40) - 1)
      (epoch * (1L << 56) + h * 65536L + seq, s"p$epoch-$seq")
    }
    val df = spark.createDataFrame(rows).toDF("key", "payload")
    val expected = Packing.stableIds(df.select("key"), "key")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // session default parallelism plus two pinned bucket counts
    val attached = Packing.withStableIds(df, "key")
      .select("key", "row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(attached == expected)
    for (nB <- Seq(2, 5)) {
      val at = Packing.withStableIdsAt(df, "key", nB)
        .select("key", "row_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(at == expected, s"nB=$nB")
    }
  }

  test("packSealedAttach == packSealed + join (shard_id and seq_in_shard)") {
    val rows = (0L until 300L).map(i => (i * 7L, i % 9 + 1, s"pay$i"))
    val df = spark.createDataFrame(rows).toDF("key", "tok", "payload")
    val expected = Packing.packSealed(df.select("key", "tok"),
        "key", "tok", budget = 16L, seqsPerShard = 4L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = Packing.packSealedAttach(df, "key", "tok",
        budget = 16L, seqsPerShard = 4L)
      .select(col("key"), col("shard_id"), col("seq_in_shard"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expected)
  }

  test("packAttach == packByBudget + join, incl. the sampled-range path") {
    // dominant point cluster (label 0 holds 240 of 300 rows at a
    // point-width 2^40 offset) forces the sampled-range fallback;
    // the uniform frame stays on the equal-width path
    val clustered = ((0L until 240L).map(i => (0L * (1L << 40) + i, i % 7 + 1)) ++
      (0L until 30L).map(i => (1L * (1L << 40) + i, i % 5 + 1)) ++
      (0L until 30L).map(i => (2L * (1L << 40) + i, i % 3 + 1)))
      .map { case (k, t) => (k, t, s"pay$k") }
    val uniform = (0L until 300L).map(i => (i * 1000003L, i % 7 + 1, s"pay$i"))
    for ((rows, name) <- Seq((clustered, "clustered"), (uniform, "uniform"))) {
      val df = spark.createDataFrame(rows).toDF("key", "tok", "payload")
      val expected = Packing.packByBudget(df.select("key", "tok"),
          "key", "tok", 16L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val got = Packing.packAttach(df, "key", "tok", 16L)
        .select("key", "seq_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, name)
      val pinned = Packing.packAttachAt(df, "key", "tok", 16L, 6)
        .select("key", "seq_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pinned == expected, s"$name pinned")
    }
  }
}
