package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the plans that must hold at 100 TB
  * — filters/projections reaching the parquet scan, small dims
  * broadcast, top-k via TakeOrderedAndProject, whole-stage codegen
  * present — enforced on the real executed plans at sf0.001. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize the AQE plan in this queryExecution
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates and projection push into the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"), p.take(2000))
    assert(p.contains("ReadSchema"))
    // narrow read: only the filter/agg columns, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_extendedprice"), readSchema)
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan("q03_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // region/nation/supplier/customer must never shuffle the fact side:
    // at most one shuffle-based join (lineitem x orders) is acceptable
    val smj = p.linesIterator.count(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(smj <= 1, s"$smj shuffled joins\n${p.take(3000)}")
  }

  test("q04: top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q04_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q01: partial aggregation before the shuffle (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, "partial+final expected")
  }

  test("q25: corpus is never joined or shuffled on q_id — heap candidates only") {
    // q25 now runs the per-partition bounded-heap shape: no join at
    // all (queries ride a broadcast variable), and the only exchange
    // ranks the partitions x queries x k candidate rows
    val p = plan("q25_sim_bruteforce_topk")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("MapPartitions"), p.take(2000))
  }

  test("whole-stage codegen covers the scan-filter-agg pipeline") {
    // in executed-plan toString codegen stages render as "*(n)" prefixes
    val p = plan("q01_pricing_summary")
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(1500))
  }

  test("q34: sketch query plans WITHOUT Expand (dedup-then-count)") {
    val p = plan("q34_approx_distinct")
    assert(!p.contains("Expand"),
      s"distinct agg must not multiply scan rows:\n${p.take(2000)}")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(1500))
  }

  test("q37: repetition query partial-aggregates before its shuffle") {
    val p = plan("q37_repetition")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p.take(2000))
    // the shingle explode happens once, scan-side — no quadratic
    // composed expression (no transform/element_at chain in the plan)
    assert(p.contains("shingles("), p.take(2000))
    assert(!p.contains("element_at"), p.take(2000))
  }

  test("q45: time-bounded join keeps its equi-key (merge join, no nested loop)") {
    val p = plan("q45_stream_join_batch")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("NestedLoop"),
      s"range condition must ride the user_id equi-join, not a nested loop:\n${p.take(2000)}")
  }

  test("q126: learned weights broadcast into the feature fold, never shuffled") {
    val p = plan("q126_nb_gate")
    // the dim+1-row weight table must reach the (doc, bucket) counts
    // as a broadcast — a shuffled join here would exchange the whole
    // feature table on bucket, a 64-value skew key at corpus scale
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    // the 1-row bias attach is a keyless cross join and must plan as a
    // broadcast nested loop, never a cartesian shuffle (the former
    // BroadcastExchange clause here was implied by the hash-join
    // assert above and could never fail independently)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    val smjOnBucket = p.linesIterator.count(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("bucket"))
    assert(smjOnBucket == 0, s"weights shuffled on bucket\n${p.take(3000)}")
  }

  test("q124: only span-hit documents are exploded and rebuilt") {
    val p = plan("q124_span_removal")
    // the untouched corpus joins the rebuilt subset by id; the
    // left-semi restriction must appear so the posexplode branch is
    // fed by span-hit docs, not the whole corpus
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("Generate posexplode") || p.contains("posexplode"),
      p.take(3000))
  }

  test("q142: decontamination inherits the span-family discipline — " +
    "hot cap broadcast anti, rebuild restricted by semi join") {
    val p = plan("q142_decontaminate_spans")
    assert(p.contains("LeftAnti"), p.take(3000)) // hot n-grams die pre-join
    assert(p.contains("LeftSemi"), p.take(3000)) // only span-hit docs rebuilt
    assert(p.contains("posexplode"), p.take(3000))
  }

  test("q157: query terms broadcast into the chunk postings — the " +
    "corpus-sized side never shuffles on term") {
    val p = plan("q157_chunk_retrieval")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    val smjOnTerm = p.linesIterator.count(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("term"))
    assert(smjOnTerm == 0, s"postings shuffled on term\n${p.take(3000)}")
  }

  test("q154: decile fan-out is a broadcast over the bucket counts, " +
    "never a shingle-table blowup") {
    val p = plan("q154_vocab_growth")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      p.take(3000))
    // the 10-way decile join must not be a shuffled join over the
    // first-seen (shingle-distinct-sized) table
    val smj = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(smj == 0, s"$smj shuffled joins\n${p.take(3000)}")
  }

  test("q172: the health-composite's scorecard joins broadcast — " +
    "#sources-sized aggregates never shuffle against each other") {
    // judge the FINAL AQE plan (the initial plan may still spell the
    // tiny joins as sort-merge before runtime stats arrive)
    val p = plan("q172_source_health").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastQueryStage"),
      p.take(3000))
    // the four signal branches each end in a #sources-sized agg; the
    // final composition must not sort-merge those tiny tables
    val smjOnSource = p.linesIterator.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("source")).toSeq
    assert(smjOnSource.isEmpty,
      s"scorecard joined by shuffle:\n${smjOnSource.mkString("\n")}")
  }

  test("q182: the FIM transform is a pure exchange-free projection") {
    val p = plan("q182_fim_transform")
    assert(!p.contains("Exchange"), p.take(3000))
    assert(p.contains("Project"), p.take(2000))
  }

  test("q184/q185: distributed rank — no GLOBAL sort anywhere in the " +
    "ordering path (the two-phase prefix rank, not a one-task sort)") {
    Seq("q184_semantic_packing", "q185_curriculum_order").foreach { q =>
      val p = plan(q)
      // a global Sort prints as `Sort [key ...], true, 0`; the rank
      // must come from the bucketed prefix count instead. (A one-row
      // Exchange SinglePartition under a scalar aggregate is fine —
      // only sorting the corpus on one task is the scale hazard.)
      val globalSorts = p.linesIterator.filter(l =>
        l.contains("Sort [") && l.contains("], true,")).toSeq
      assert(globalSorts.isEmpty,
        s"$q sorts globally:\n${globalSorts.mkString("\n")}")
    }
  }

  test("asof join plans a single shuffle (union + one window)") {
    val p = plan("q27_asof_join")
    val exchanges = p.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      p.linesIterator.count(_.trim.startsWith(":- Exchange")) +
      p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(p.contains("Window"), p.take(1500))
    assert(exchanges <= 2, s"$exchanges exchanges\n${p.take(3000)}")
  }

  test("q272: the tagged aggregate is served from the rollup, not the " +
      "fact scan — and untagged scans on the same session never are") {
    val p = plan("q272_rollup_rewrite")
    assert(p.contains("graft_rollup_"),
      s"rollup scan missing\n${p.take(3000)}")
    assert(!p.contains("documents.parquet"),
      s"fact table still scanned\n${p.take(3000)}")
    // scope control: with the rule still installed, an UNTAGGED
    // identical aggregation must scan the fact table
    val df = graft.Tables.t(spark, sf, "documents")
      .groupBy(org.apache.spark.sql.functions.col("source"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"))
    df.collect()
    val up = df.queryExecution.executedPlan.toString
    assert(up.contains("documents.parquet"), up.take(2000))
    assert(!up.contains("graft_rollup_"), up.take(2000))
  }

  test("q298: the partitioned fact scan carries a dynamicpruning " +
      "subquery in its partition filters (DPP fired, not a static " +
      "full scan)") {
    val p = plan("q298_dpp_join")
    assert(p.contains("dynamicpruning"),
      s"no dynamic pruning in plan\n${p.take(3000)}")
  }

  test("q315: a dimension-sliced aggregate is served from the rollup; " +
      "a MEASURE-filtered one bounces to the fact scan") {
    val p = plan("q315_rollup_filtered")
    assert(p.contains("graft_rollup_f_"),
      s"rollup scan missing\n${p.take(3000)}")
    assert(!p.contains("documents.parquet"),
      s"fact table still scanned\n${p.take(3000)}")
    // row-grain filter on a fact measure: cells can't answer it
    import org.apache.spark.sql.functions.{col, count, lit}
    val df = spark.read.option("graft.rollupRewrite", "true")
      .parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 100)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    df.collect()
    val up = df.queryExecution.executedPlan.toString
    assert(up.contains("documents.parquet"), up.take(2000))
    assert(!up.contains("graft_rollup_"), up.take(2000))
  }

  test("q316: count(DISTINCT dimension) navigates to the cell grid") {
    val p = plan("q316_rollup_distinct")
    assert(p.contains("graft_rollup_f_"),
      s"rollup scan missing\n${p.take(3000)}")
    assert(!p.contains("documents.parquet"),
      s"fact table still scanned\n${p.take(3000)}")
  }

  test("q296: count/avg/min/max all navigate to the v3 rollup (no " +
      "fact scan); a rollup lacking min/max bounces min() queries " +
      "back to the fact table") {
    val p = plan("q296_rollup_avg")
    assert(p.contains("graft_rollup_v3_"),
      s"v3 rollup scan missing\n${p.take(3000)}")
    assert(!p.contains("documents.parquet"),
      s"fact table still scanned\n${p.take(3000)}")
    // derivability guard: the q272-shape rollup (count/sum only) is
    // installed, then a min() aggregate arrives — the rule must NOT
    // serve it (the rollup has no min partial)
    import org.apache.spark.sql.functions.{col, min => smin}
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_rollup_" +
      math.abs(sf.hashCode.toLong)
    graft.plans.RollupRewrite.install(spark, spark.read.parquet(path))
    val df = spark.read.option("graft.rollupRewrite", "true")
      .parquet(s"$sf/documents.parquet")
      .groupBy(col("source")).agg(smin(col("n_chars")).as("m"))
    df.collect()
    val up2 = df.queryExecution.executedPlan.toString
    assert(up2.contains("documents.parquet"), up2.take(2000))
    assert(!up2.contains("graft_rollup_"), up2.take(2000))
  }

  test("q328: both batch-plan policies rank via the two-phase prefix " +
    "count — no global one-task sort of the corpus") {
    val p = plan("q328_padding_plan")
    val globalSorts = p.linesIterator.filter(l =>
      l.contains("Sort [") && l.contains("], true,")).toSeq
    assert(globalSorts.isEmpty,
      s"padding plan sorts globally:\n${globalSorts.mkString("\n")}")
  }

  test("q331: the native decayed-sum window runs as one Window over " +
    "one key exchange — no join, no extra shuffle") {
    val p = plan("q331_decayed_window")
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("decayed_sum_fixed"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    // count in the FINAL plan only — AQE's toString repeats the tree
    // under "== Initial Plan ==", double-counting every exchange
    val finalPlan = p.split("== Initial Plan ==")(0)
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange "))
    assert(exchanges <= 1, s"$exchanges exchanges\n${finalPlan.take(3000)}")
  }

  test("q345: the lateness running max never sorts the corpus " +
    "globally — the per-bucket window partitions by bucket") {
    // the gated query localCheckpoints the lateness frame (three
    // threshold scans share one pass), which hides its stage from the
    // final plan — pin the UNCHECKPOINTED running-max frame directly
    import org.apache.spark.sql.functions._
    val uP = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val e = graft.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts"))
      .withColumn("h",
        expr("conv(substr(md5(cast(event_id as string)),1,12),16,10)")
          .cast("long"))
      .withColumn("bucket", expr("h div 68719476736"))
    val bmax = e.groupBy(col("bucket")).agg(max(col("ts")).as("bm"))
    val pre = bmax.withColumn("pm", max(col("bm")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
          .rowsBetween(uP, -1)))
      .select(col("bucket"), col("pm"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("h"), col("event_id"))
      .rowsBetween(uP, -1)
    val lat = e.join(broadcast(pre), Seq("bucket"))
      .withColumn("prev", greatest(coalesce(col("pm"), lit(0L)),
        coalesce(max(col("ts")).over(wIn), lit(0L))))
    lat.collect()
    val p = lat.queryExecution.executedPlan.toString
    val globalSorts = p.linesIterator.filter(l =>
      l.contains("Sort [") && l.contains("], true,")).toSeq
    assert(globalSorts.isEmpty,
      s"running max sorts globally:\n${globalSorts.mkString("\n")}")
    // the corpus-side window partitions by bucket; the only
    // SinglePartition exchange feeds the <=4096-row bucket-maxima
    // window (its input is the per-bucket AGGREGATE, never the corpus)
    val finalPlan = p.split("== Initial Plan ==")(0)
    val corpusWindow = finalPlan.linesIterator.exists(l =>
      l.contains("Window [") && l.contains("windowspecdefinition(bucket"))
    assert(corpusWindow, s"per-bucket window missing\n${finalPlan.take(3000)}")
  }

  test("q322/q323: conversation assembly is window+agg per user — " +
    "no global sort, no join in the assembly path") {
    Seq("q322_conversations", "q323_chat_render").foreach { q =>
      val p = plan(q)
      val globalSorts = p.linesIterator.filter(l =>
        l.contains("Sort [") && l.contains("], true,")).toSeq
      assert(globalSorts.isEmpty,
        s"$q sorts globally:\n${globalSorts.mkString("\n")}")
      assert(!p.contains("Join"), s"$q joins:\n${p.take(2000)}")
    }
  }
}
