package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable summary sketches — the bounded-state substitutes for
  * exact `groupBy`s when the corpus no longer fits a shuffle budget:
  * KMV (distinct cardinality), Count-Min (per-item frequency), and
  * fixed-grid histograms (quantiles). Each sketch is a few KB of
  * state that merges ASSOCIATIVELY, so per-source / per-partition /
  * per-day sketches roll up to corpus totals without touching rows
  * again — the monitoring path for a 100 TB pipeline where "how many
  * distinct tokens did src7 add this week" must not cost a full
  * vocabulary shuffle.
  *
  * Every hash is an md5 prefix (identical in Spark and DuckDB), so
  * unlike engine-native sketches (`approx_count_distinct`, q34) the
  * ESTIMATES themselves are exactly oracle-checkable cross-engine —
  * and the oracle computing the global KMV row *directly* while
  * Spark computes it by *merging* per-source sketches turns the
  * correctness gate into a proof of merge associativity.
  */
object Sketches {

  /** 48-bit hash: the first 12 hex chars of md5 as a BIGINT — wide
    * enough that the birthday bound at 10⁹ distinct values keeps
    * collision counts negligible for estimation, narrow enough to be
    * exact in both engines' 64-bit integers (and in DOUBLE-free
    * integer arithmetic). DuckDB mirror:
    * `('0x' || substr(md5(x), 1, 12))::BIGINT`. */
  val Hash48Max: Long = 1L << 48

  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Per-key k smallest DISTINCT hash values, ascending, as one
    * bounded array row per key — the KMV sketch.
    *
    * Scale shape: phase 1 keeps a ≤ k-entry sorted set per key per
    * partition (a `mapPartitions` fold — no shuffle, no global
    * distinct of the value stream), so the only exchange carries
    * ≤ k·partitions values per key; phase 2 merges the partials with
    * `flatten → array_distinct → array_sort → slice`, which is ALSO
    * the production merge operator for rolling per-source sketches
    * up to a corpus sketch ([[kmvMerge]]). The raw token stream is
    * never globally deduplicated — dedup happens inside the k-sized
    * sets, which is the entire point of the sketch. */
  def kMinPerKey(df: DataFrame, keyCol: String, hCol: String,
                 k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val partial = df.select(col(keyCol).cast("string"), col(hCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { case (key, h) =>
          val s = m.getOrElseUpdate(key, new java.util.TreeSet[java.lang.Long]())
          if (s.size < k) s.add(h)
          else if (h < s.last) { if (s.add(h)) s.pollLast() }
        }
        m.iterator.map { case (key, s) =>
          val arr = new Array[Long](s.size)
          val sit = s.iterator(); var i = 0
          while (sit.hasNext) { arr(i) = sit.next(); i += 1 }
          (key, arr.toSeq)
        }
      }
      .toDF(keyCol, "hs")
    partial.groupBy(col(keyCol)).agg(kmvMerge(col("hs"), k).as("hs"))
  }

  /** Merge of KMV sketch arrays under an aggregation: k smallest
    * distinct values of the union — associative and idempotent, so
    * per-source sketches roll up to the corpus sketch exactly. */
  def kmvMerge(hs: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(collect_list(hs)))), 1, k)

  /** KMV cardinality estimate from a sketch array: exact when the
    * sketch saw fewer than k distinct values, else
    * `(k-1) · 2⁴⁸ div h_k` — kept in BIGINT arithmetic end to end
    * ((k−1)·2⁴⁸ exceeds DOUBLE's 53-bit mantissa, and NOTES.md's
    * round-11 rule stands: `/` on two long Columns is DOUBLE
    * division, so the quotient is spelled `div`). */
  def kmvEstimate(hs: Column, k: Int): Column =
    when(size(hs) < k, size(hs).cast("long"))
      .otherwise(expr(s"${(k - 1).toLong * Hash48Max}L div element_at(hs, $k)"))

  /** Count-Min sketch of a (item, count) frequency table: `depth`
    * independent md5-salted bucketings of `width` cells, each cell
    * the sum of counts hashing into it. The sketch is depth·width
    * cells TOTAL (map-side-combined aggregation output), regardless
    * of vocabulary size — the frequency-monitoring state a streaming
    * deployment keeps per window and merges by cell-wise sum.
    * Input: (itemCol, cntCol). Output: (row, bucket, cell). */
  def cmsSketch(tf: DataFrame, itemCol: String, cntCol: String,
                depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    tf.select(col(itemCol).as("__w"), col(cntCol).cast("long").as("__c"))
      .withColumn("row", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", cmsBucket(col("row"), col("__w"), width))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("__c")).as("cell"))
  }

  /** Merge CMS sketches by cell-wise sum — Count-Min is LINEAR, so
    * the sketch of a union of disjoint streams is the sum of their
    * sketches (the per-partition / per-batch rollup law; q232 proves
    * it through the gate). Absent cells are zero, so a plain
    * union+sum needs no outer join. NOTE the linearity flip side:
    * unlike KMV's idempotent set-union merge, re-adding a batch
    * DOUBLE-COUNTS — replay safety needs a landed-batch ledger
    * ([[graft.streaming.StreamingSketch.processCmsBatch]]). */
  def cmsMergeCells(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cell")).as("cell"))

  /** DELETE-fold: linearity cuts both ways — subtracting a deleted
    * slice's sketch cell-wise leaves exactly the sketch of the
    * surviving stream (sketch(S) − sketch(D) = sketch(S∖D) for
    * D ⊆ S), so right-to-be-forgotten erasure never rescans the
    * retained corpus: per-delete work is the deleted slice's scan
    * plus a depth·width-bounded sum. Cells that reach zero are
    * DROPPED, restoring the sparse absent-is-zero representation —
    * the folded table is cell-for-cell the from-scratch sketch of
    * the survivors (q282 proves it through the gate). `minuend`
    * must contain the deleted rows (subtracting counts that were
    * never added leaves negative cells — a corrupt sketch). */
  def cmsSubtractCells(minuend: DataFrame, deleted: DataFrame): DataFrame =
    cmsMergeCells(minuend,
      deleted.select(col("row"), col("bucket"), (-col("cell")).as("cell")))
      .filter(col("cell") =!= 0L)

  /** Cell index of `item` in sketch row `row`: salted 48-bit md5
    * mod width (mod of a non-negative BIGINT — portable). */
  def cmsBucket(row: Column, item: Column, width: Int): Column =
    hash48(concat(row.cast("string"), lit("|"), item)) % width

  /** Point estimates for `cands` (itemCol) against a sketch:
    * min over rows of the addressed cells — the classic Count-Min
    * upper bound (estimate ≥ true count ALWAYS; equality iff no
    * colliding item shares all `depth` cells). The sketch side is
    * depth·width rows — broadcast — so the lookup is exchange-free
    * on the candidate side. Output: cands + `cms_est`. */
  def cmsLookup(sketch: DataFrame, cands: DataFrame, itemCol: String,
                depth: Int, width: Int): DataFrame = {
    val addressed = cands
      .withColumn("row", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", cmsBucket(col("row"), col(itemCol), width))
    addressed
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(addressed.columns.toSeq
        .filter(c => c != "row" && c != "bucket").map(col): _*)
      .agg(min(col("cell")).as("cms_est"))
  }

  /** HyperLogLog register table of a hashed stream: register index =
    * the hash's top `p` bits, register value = max over the stream of
    * `rank(w) = (48-p) - floor(log2(w)) + 1` (leading-zero count + 1
    * of the remaining `48-p` bits, capped at `cap`). One row per
    * OCCUPIED (key, reg) — at most `2^p` rows per key, the entire
    * standing state.
    *
    * Contrast with the other two sketches: the merge is register-wise
    * MAX — associative AND IDEMPOTENT like KMV's set union (so replay
    * folds need no landed-batch ledger, unlike CMS's linear sum), but
    * the state is `2^p` small ints regardless of `k`-vs-cardinality,
    * where KMV keeps `k` full hashes. `floor(log2 w)` is spelled
    * `length(bin(w)) - 1` — `bin` renders minimal-width binary in
    * BOTH engines, so ranks (hence registers, hence the estimate's
    * integer arithmetic) are exactly oracle-checkable. The cap bounds
    * `2^(cap-rank)` terms so the estimator below never leaves BIGINT;
    * capping only bites past ~`2^cap · 2^p` distincts (document-scale
    * astronomically safe at cap=30).
    *
    * Scale shape: one map-side-combined `groupBy(key, reg) max` —
    * duplicates collapse in the partial agg; no distinct, no shuffle
    * of the raw stream beyond `2^p · partitions` partial rows. */
  def hllRegisters(df: DataFrame, keyCol: String, hCol: String,
                   p: Int, cap: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    require(cap >= 8 && cap <= 30, s"cap must be in [8,30], got $cap")
    val wBits = 48 - p
    val wDiv = 1L << wBits
    df.select(col(keyCol),
        expr(s"$hCol div ${wDiv}L").as("reg"),
        (col(hCol) % wDiv).as("__w"))
      .withColumn("r",
        when(col("__w") === 0, lit(cap))
          .otherwise(least(lit(wBits + 1) - length(bin(col("__w"))),
            lit(cap))))
      .groupBy(col(keyCol), col("reg")).agg(max(col("r")).as("r"))
  }

  /** Merge HLL register tables by register-wise max — idempotent, so
    * re-folding a batch (at-least-once replay) is a no-op by algebra,
    * not by ledger. */
  def hllMergeRegs(regs: DataFrame*): DataFrame = {
    val keyCols = regs.head.columns.takeWhile(_ != "reg")
    regs.reduce(_ unionByName _)
      .groupBy((keyCols :+ "reg").map(col): _*).agg(max(col("r")).as("r"))
  }

  /** α numerator per register count (Flajolet et al. 2007 Fig. 3
    * constants as exact rationals over 1000, small-m cases). */
  private def hllAlphaNum(p: Int): Long = p match {
    case 4 => 673L; case 5 => 697L; case 6 => 709L
    case _ => 721L // 0.7213/(1+1.079/m) ≈ 0.721 for m ≥ 128
  }

  /** Raw HLL estimate per key from a register table, BIGINT end to
    * end: `E = α·m²·2^cap div Z` with `Z = Σ_j 2^(cap − M_j)`
    * (absent registers contribute `2^cap`, i.e. `M_j = 0`). No
    * small/large-range corrections — callers keep an exact
    * verification column and operate in the raw estimator's regime
    * (`n ≳ 3m`); `α·m²·2^cap < 2^(10+2p+cap)` must stay under 2^63,
    * enforced below. Output: (key, hll_est). */
  def hllEstimate(regs: DataFrame, keyCol: String, p: Int,
                  cap: Int): DataFrame = {
    require(2 * p + cap <= 52, s"alpha*m^2*2^cap overflows: p=$p cap=$cap")
    val m = 1L << p
    val num = hllAlphaNum(p) * m * m * (1L << cap)
    regs.groupBy(col(keyCol))
      .agg((sum(expr(s"shiftleft(1L, $cap - r)"))
        + (lit(m) - count(lit(1))) * (1L << cap)).as("__z"))
      .select(col(keyCol), expr(s"${num}L div (1000L * __z)").as("hll_est"))
  }

  /** Fixed-grid histogram of a non-negative integer column: bucket =
    * value div width, count per bucket — the mergeable (cell-wise
    * sum) quantile state. Output: (bucket, cnt). */
  def histogram(df: DataFrame, valCol: String, width: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    df.select(expr(s"$valCol div $width").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Histogram DELETE-fold: bucket counts are linear like CMS cells
    * ([[cmsSubtractCells]]), so erasing a slice subtracts its
    * histogram cell-wise and drops emptied buckets — the folded table
    * is the from-scratch histogram of the survivors (q289 proves it
    * through the gate). `minuend` must contain the deleted rows. */
  def histSubtract(minuend: DataFrame, deleted: DataFrame): DataFrame =
    minuend.unionByName(
        deleted.select(col("bucket"), (-col("cnt")).as("cnt")))
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0L)

  /** Quantile estimates from a histogram: for each percentile p the
    * estimate is the UPPER EDGE of the first bucket whose cumulative
    * count reaches `ceil(p·n/100)` — so `exact ≤ estimate <
    * exact + width` by construction, the bound the gated query
    * asserts against the exact type-1 quantile. The cumulative
    * window runs over the histogram (≤ max(value)/width rows — sketch
    * cells, not data rows). Output: (pct, est_hi). */
  def histQuantiles(hist: DataFrame, width: Int,
                    pcts: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val total = hist.agg(sum(col("cnt")).as("n"))
    val p = pcts.map(_.toLong).toDF("pct")
    // integer cum ≥ ceil(p·n/100)  ⟺  100·cum ≥ p·n — no division at all
    cum.crossJoin(broadcast(total)).crossJoin(broadcast(p))
      .filter(col("cum") * 100 >= col("pct") * col("n"))
      .groupBy(col("pct"))
      .agg(((min(col("bucket")) + 1) * width - 1).cast("long").as("est_hi"))
  }
}
