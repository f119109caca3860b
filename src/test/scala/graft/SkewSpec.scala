package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Skew guards: one synthetic hot bucket must not produce quadratic
  * output (dedup) or a quadratic in-bucket join (similarity). */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedup LSH: hot bucket falls back to star pairing, linear output") {
    // 60 byte-identical docs → one hot (band, sig) bucket per band
    val docs = ((0 until 60).map(i => (i.toLong, "aa bb cc dd ee ff gg")) ++
      Seq((100L, "totally different text here right now"),
          (101L, "another unrelated document entirely today")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val unbounded = Dedup.lshCandidatePairs(sigs, "doc_id")
    assert(unbounded.count() == 60L * 59 / 2) // quadratic without a guard
    val capped = Dedup.lshCandidatePairs(sigs, "doc_id", maxBucketSize = 10)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 59) // star: every dup linked to the min id
    assert(pairs.forall(_._1 == 0L)) // canonical = bucket minimum
    assert(pairs.map(_._2).toSet == (1L until 60L).toSet) // component intact
  }

  test("similarity LSH: overfull bucket excluded from the self-join") {
    // 30 vectors in the all-positive sign bucket; 4 in two small ones
    val hot = (0 until 30).map(i => (i.toLong, Array.fill(8)(1f + i * 0.01f)))
    val smallA = Seq((100L, Array(-1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
                     (101L, Array(-1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)))
    val smallB = Seq((200L, Array(1f, -1f, 1f, 1f, 1f, 1f, 1f, 1f)),
                     (201L, Array(1f, -1f, 1f, 1f, 1f, 1f, 1f, 1f)))
    val corpus = (hot ++ smallA ++ smallB).toDF("vec_id", "embedding")
    val capped = Similarity.lshSimilarPairs(
      corpus, "vec_id", "embedding", 8, 0.5, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L), (200L, 201L))) // hot bucket skipped
    val unbounded = Similarity.lshSimilarPairs(
      corpus, "vec_id", "embedding", 8, 0.5)
    assert(unbounded.count() == 30L * 29 / 2 + 2) // would be quadratic
  }

  test("multi-band LSH recovers pairs a hot band drops") {
    // band 0 (dims 1-4): everyone identical → hot, excluded at cap.
    // band 1 (dims 5-8): 10 groups of 2 by sign pattern → small buckets.
    def vec(group: Int): Array[Float] = {
      val signs = (0 until 4).map(b => if (((group >> b) & 1) == 1) 1f else -1f)
      Array(1f, 1f, 1f, 1f) ++ signs
    }
    val corpus = (0 until 20).map(i => (i.toLong, vec(i % 10)))
      .toDF("vec_id", "embedding")
    val banded = Similarity.lshSimilarPairsBanded(
      corpus, "vec_id", "embedding", bitsPerBand = 4, bands = 2,
      threshold = 0.99, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors i and i+10 share band-1 buckets of size 2
    assert(banded == (0 until 10).map(i => (i.toLong, i + 10L)).toSet)
  }

  test("salted join spreads a hot key, result identical to the plain join") {
    import graft.operators.SaltedJoin
    val salts = 8
    // 95% of fact rows share one hot key
    val fact = spark.range(20000)
      .select(when(col("id") % 20 =!= 0, 1L).otherwise(col("id") % 100)
        .as("k"), col("id").as("v"))
    val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("d"))
    val plain = fact.join(dim, "k")
    val salted = SaltedJoin.join(fact, dim, "k", salts)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum(col("v")), sum(col("d"))).head() ==
      plain.agg(sum(col("v")), sum(col("d"))).head())
    // the hot key's rows actually spread: hash-distributing on
    // (k, salt) bounds the biggest reducer near 1/salts of the hot
    // rows, where (k) alone concentrates them all in one partition
    val bySalt = fact.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === 1L).select("count")
      .collect().map(_.getLong(0))
    assert(bySalt.length == salts)
    assert(bySalt.max < (20000 * 0.95 / salts * 1.5).toLong,
      s"hot-key rows per salt: ${bySalt.mkString(",")}")
  }

  test("exactSubstringSpans: hot n-gram pruned BEFORE the self-join shuffle") {
    // 60 docs all opening with the same 10-token boilerplate phrase
    // (each of its 5-grams occurs 60 times, over the cap of 50) plus
    // unique filler; docs 100/101 share a 12-token span that is
    // unique to them. The cap must kill the boilerplate spans while
    // the legitimate span survives.
    val boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    val shared = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11"
    val docs = ((0 until 60).map(i =>
        (i.toLong, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e")) ++
      Seq((100L, s"x0 x1 x2 $shared x3 x4 x5"),
          (101L, s"y0 $shared y1 y2 y3")))
      .toDF("doc_id", "text")

    // Unguarded (cap above the boilerplate population): quadratic —
    // every boilerplate pair reports a span.
    val unbounded = Dedup.exactSubstringSpans(docs, "doc_id", "text",
      maxOccurrences = 10000)
    assert(unbounded.count() == 60L * 59 / 2 + 1)

    val capped = Dedup.exactSubstringSpans(docs, "doc_id", "text")
    // The guard engages AHEAD of the join: the hot set is excluded
    // via a broadcast left-anti join (map-side drop), not a
    // post-shuffle count window — pinned on the physical plan.
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"), plan.take(2000))
    val rows = capped.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (100L, 101L, 3L, 1L, 12L))
  }

  test("incremental spans: hot cap is a corpus statistic, pruned pre-join") {
    // Same corpus as the batch test: boilerplate in 60 OLD docs, one
    // legitimate span between old doc 100 and NEW doc 101. The hot
    // set must come from the FULL table (old+new), and the batch
    // probe must not resurrect boilerplate pairs even though each
    // new-side n-gram occurrence is itself rare.
    val boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    val shared = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11"
    val docs = ((0 until 60).map(i =>
        (i.toLong, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e")) ++
      Seq((100L, s"x0 x1 x2 $shared x3 x4 x5"),
          (101L, s"y0 $shared y1 y2 y3 $boiler")))
      .toDF("doc_id", "text")
    val ng = Dedup.positionedNgrams(docs, "doc_id", "text", 5)
    val rows = Dedup.spansIncrementalFromNgrams(ng, "doc_id",
      col("doc_id") === 101L).collect()
    // doc 101 carries the boilerplate too (61st occurrence set) — the
    // corpus-wide cap kills it; only the legitimate span survives
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(4)) == (100L, 101L, 12L))
  }

  test("semanticDedup: degenerate embedding mode prunes, never explodes") {
    // 30 vectors collapse into one dense mode (one cluster regardless
    // of k); 3 more sit in a second direction, two of them near-dups.
    // Fixed centroids make assignment deterministic for the assert.
    val dense = (0 until 30).map(i =>
      (i.toLong, Array.fill(8)(1f + i * 0.001f)))
    val small = Seq(
      (100L, Array(-1f, -1f, -1f, -1f, -1f, -1f, -1f, -1f)),
      (101L, Array(-1f, -1f, -1f, -1f, -1f, -1f, -1f, -1.01f)),
      (102L, Array(-1f, -1f, -1f, -1f, 1f, 1f, -1f, -1f)))
    val corpus = (dense ++ small).toDF("vec_id", "embedding")
    val cents = Some(Array(Array.fill(8)(1.0), Array.fill(8)(-1.0)))

    // Unbounded: the dense mode's 30 rows keep only their min id.
    val unbounded = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      k = 2, minCos = 0.9, centroids = cents)
    assert(unbounded.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet == Set(0L, 100L, 102L))

    // Capped: the overfull cluster is EXCLUDED from the pair search —
    // its members all report kept=true (documented recall loss) while
    // the small cluster still dedups (101 drops behind 100).
    val capped = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      k = 2, minCos = 0.9, maxClusterPop = 10, centroids = cents)
    val keptSet = capped.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet
    assert(keptSet == (0L until 30L).toSet ++ Set(100L, 102L))
    assert(capped.count() == 33) // every input row still reported
  }
}
