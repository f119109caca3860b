package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges reproduces the hand-computed merge sequence, stops when dry") {
    // words: abab ×3, abc ×2.
    // round 0: (a,b) count 8 (2 per abab + 1 per abc) beats (b,a)=3,(b,c)=2
    // round 1: (ab,ab)=3 beats (ab,c)=2
    // round 2: (ab,c)=2
    // round 3: nothing repeats -> early stop at 3 of the requested 5
    val df = Seq((0L, "abab abc abab"), (1L, "abab abc")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(df, "text", numMerges = 5)
    assert(merges == Seq(("a", "b"), ("ab", "ab"), ("ab", "c")))
  }

  test("kernel encode == composed replace-chain encode on the corpus") {
    val merges = Seq(("a", "b"), ("ab", "ab"), ("ab", "c"))
    val df = Seq("ababc", "abab abc ababab", "xyz", "", "a",
      "abcabab cababa").toDF("text")
    val both = df.select(
      TextFunctions.bpeEncode(col("text"), merges).as("kernel"),
      Bpe.encodeComposed(col("text"), merges).as("composed"))
    assert(both.filter(not(col("kernel") === col("composed"))).count() == 0)
    // spot-check the cascade: later merges apply to earlier outputs
    val one = df.filter(col("text") === "ababc")
      .select(TextFunctions.bpeEncode(col("text"), merges))
      .as[Seq[String]].head()
    assert(one == Seq("abab", "c"))
  }

  test("encode round-trips: concatenated tokens reproduce the text") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.learnMerges(d, "text", numMerges = 6)
    assert(merges.length == 6) // real corpus has at least 6 repeating pairs
    val bad = d.select(
        array_join(TextFunctions.bpeEncode(col("text"), merges), "").as("glued"),
        regexp_replace(col("text"), " ", "").as("orig"))
      .filter(col("glued") =!= col("orig"))
    assert(bad.count() == 0) // tokenization is lossless
  }

  test("greedy merge application: overlapping pairs resolve left-to-right") {
    // [a,a,a] with merge (a,a) -> [aa, a], never [a, aa]
    val merges = Seq(("a", "a"))
    val out = Seq("aaa").toDF("text")
      .select(TextFunctions.bpeEncode(col("text"), merges))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "a"))
    val composed = Seq("aaa").toDF("text")
      .select(Bpe.encodeComposed(col("text"), merges))
      .as[Seq[String]].head()
    assert(composed == Seq("aa", "a"))
  }

  test("incremental word tables: merged slices train the from-scratch merges") {
    val df = Seq((0L, "abab abc abab"), (1L, "abab abc"), (2L, "abc cc abab"))
      .toDF("doc_id", "text")
    val scratch = Bpe.learnMerges(df, "text", 4)
    val merged = Bpe.learnMergesFromWords(
      Bpe.mergeWordTables(
        Bpe.wordTable(df.filter($"doc_id" < 2), "text"),
        Bpe.wordTable(df.filter($"doc_id" === 2), "text")), 4)
    assert(merged == scratch)
  }

  test("saveMerges/loadMerges round-trips the artifact in rank order") {
    val merges = Seq(("a", "b"), ("ab", "ab"), ("ab", "c"))
    Bpe.saveMerges(spark, "graft_test_bpe_merges", merges)
    assert(Bpe.loadMerges(spark, "graft_test_bpe_merges") == merges)
    // overwrite, don't append
    Bpe.saveMerges(spark, "graft_test_bpe_merges", merges.take(1))
    assert(Bpe.loadMerges(spark, "graft_test_bpe_merges") == merges.take(1))
  }

  test("encode runs unchanged on a stream (stream == batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val rows = Seq((0L, "abab xy"), (1L, "ababab b"))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.bpeEncode($"text", merges).as("toks"))
      .writeStream.outputMode("append").format("memory")
      .queryName("bpe_stream").start()
    mem.addData(rows: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("bpe_stream")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val batch = rows.toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.bpeEncode($"text", merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(streamed == batch)
    assert(batch(0L) == List("abab", "x", "y"))
  }

  test("encode is a zero-exchange codegen projection") {
    val merges = Seq(("a", "b"))
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.bpeEncode(col("text"), merges))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(plan.contains("*(1) Project")) // the codegen'd stage prefix
  }
}
