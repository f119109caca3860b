package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Brute force is the correctness baseline: broadcast the (small)
  * query set against the full corpus — one pass, no shuffle of the
  * corpus side, O(|corpus|·|queries|) cosines inside codegen.
  *
  * The scale path is sign-bit LSH bucketing: an 8-bit bucket key
  * partitions the corpus ~256 ways; the self-join shuffles on the
  * bucket key only, and candidate pairs are in-bucket only. At 100 TB
  * the same shape holds with more bits (buckets sized to executor
  * memory) or an IVF coarse quantizer as the bucket assignment.
  */
object Similarity {

  /** Top-k neighbors per query by brute-force cosine.
    * Ranking uses the 4-decimal-rounded cosine with id tie-break so
    * results are reproducible across engines/summation orders. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 4).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** [[bruteForceTopK]] result, shaped for 100 TB: the window form
    * above hash-shuffles EVERY scored (corpus × queries) row on q_id
    * just to rank — with few queries that is both the full cross
    * product through an exchange and extreme key skew. Here each
    * corpus partition keeps a bounded per-query heap (mapPartitions —
    * the one imperative hop; no relational form avoids that shuffle),
    * so only |partitions| × |queries| × k candidates reach the final
    * exact rank. Scores round to 4 decimals with HALF_UP before
    * comparison — bit-identical ordering (and output) to the window
    * form, id tie-breaks included. */
  def bruteForceTopKScalable(corpus: DataFrame, queries: DataFrame,
                             idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(idCol), col(vecCol)).as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(qs)
    val worstFirst = Similarity.worstFirst
    val cand = corpus.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val queries = bc.value
        val heaps = queries.map(_ =>
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(worstFirst))
        it.foreach { case (nId, vec) =>
          var i = 0
          while (i < queries.length) {
            val (qId, qVec) = queries(i)
            if (qId != nId) {
              val raw = graft.functions.VectorKernels.cosineArr(qVec, vec)
              val c = if (raw.isNaN) raw // BigDecimal.valueOf rejects NaN
                else java.math.BigDecimal.valueOf(raw)
                  .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
              val h = heaps(i)
              if (h.size < k) h.enqueue((c, nId))
              else {
                val (wc, wid) = h.head
                val cmp = java.lang.Double.compare(c, wc)
                if (cmp > 0 || (cmp == 0 && nId < wid)) { h.dequeue(); h.enqueue((c, nId)) }
              }
            }
            i += 1
          }
        }
        queries.iterator.zip(heaps.iterator).flatMap { case ((qId, _), h) =>
          h.iterator.map { case (c, nId) => (qId, nId, c) }
        }
      }
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    cand.toDF("q_id", "n_id", "cos")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Worst candidate at the heap head: lowest score, then LARGEST id.
    * `java.lang.Double.compare` gives Spark's total order (NaN
    * largest), so heap eviction agrees exactly with a
    * `orderBy(cos.desc, id.asc)` window rank. */
  private[operators] val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  /** Exact top-k rows per key over a pre-scored (q_id, n_id, cos)
    * frame: partition-local bounded heaps shrink the candidate set to
    * |partitions| × |keys| × k BEFORE the one rank exchange — the
    * generic tail of any scored-candidates pipeline (IVF probes, LSH
    * verification) that would otherwise shuffle every scored row on
    * q_id just to rank. Ordering matches `orderBy(cos.desc,
    * n_id.asc)` exactly, ties and NaN included.
    *
    * Duplicate (q_id, n_id) rows would be counted twice by a heap and
    * silently inflate ranks. Both current callers (IVF probe: one list
    * per vector; brute force: one score per pair) guarantee uniqueness
    * for free — a caller that can't (e.g. multi-band LSH candidates)
    * must pass `dedupCandidates = true`, which collapses duplicates on
    * (q_id, n_id) before the heaps (one extra exchange over the
    * candidate set; scores are deterministic per pair, so max(cos) is
    * the identity on true duplicates). */
  def topKPerKey(scored: DataFrame, k: Int,
                 dedupCandidates: Boolean = false): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val unique =
      if (dedupCandidates)
        scored.groupBy(col("q_id"), col("n_id")).agg(max(col("cos")).as("cos"))
      else scored
    val cand = unique.select(col("q_id"), col("n_id"), col("cos"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (q, n, c) =>
          val h = heaps.getOrElseUpdate(q,
            new scala.collection.mutable.PriorityQueue[(Double, Long)]()(worstFirst))
          if (h.size < k) h.enqueue((c, n))
          else {
            val (wc, wid) = h.head
            val cmp = java.lang.Double.compare(c, wc)
            if (cmp > 0 || (cmp == 0 && n < wid)) { h.dequeue(); h.enqueue((c, n)) }
          }
        }
        heaps.iterator.flatMap { case (q, h) =>
          h.iterator.map { case (c, n) => (q, n, c) }
        }
      }
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    cand.toDF("q_id", "n_id", "cos")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** All in-bucket pairs with cosine ≥ threshold (sign-bit LSH).
    * Output: (id_a, id_b, cos) with id_a < id_b.
    *
    * Skew guard: a degenerate bucket (e.g. the all-zeros sign pattern
    * of sparse vectors) makes the self-join quadratic; buckets larger
    * than `maxBucketSize` are EXCLUDED from the join (documented
    * recall loss — the multi-band variant below recovers most such
    * pairs via other bands). Default keeps exact semantics. */
  def lshSimilarPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      bits: Int, threshold: Double,
                      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val withBucket = corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"))
    val guarded =
      if (maxBucketSize == Int.MaxValue) withBucket
      else {
        // one tiny agg (bucket → count), broadcast back as a filter
        val counts = withBucket.groupBy(col("bucket"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBucketSize)
        withBucket.join(broadcast(counts.select(col("bucket"))), Seq("bucket"))
      }
    val a = guarded.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = guarded.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Multi-band sign-LSH similar pairs: `bands` independent bucket
    * keys over disjoint vector slices; a pair is a candidate if it
    * collides in ANY band (higher recall than one wide key), and each
    * band's buckets are ~2^bitsPerBand-way partitioned — smaller and
    * more uniform than a single band's, which is what survives skew
    * at corpus scale. Per-(band, bucket) population is capped at
    * `maxBucketSize` (degenerate patterns excluded, like
    * [[lshSimilarPairs]]). Output: (id_a, id_b, cos), id_a < id_b,
    * each pair once. */
  /** HARD-NEGATIVE MINING for contrastive / embedding training
    * (in-batch-negatives literature, e.g. DPR Karpukhin et al. 2020):
    * for each anchor, the positive is its nearest SAME-label neighbor
    * and the hard negatives are the k nearest DIFFERENT-label
    * neighbors — near-misses the loss learns the most from, versus
    * random negatives that are trivially far. Output one row per
    * (anchor, negative): (q_id, pos_id, pos_cos, neg_id, neg_cos, rk)
    * with rk by (neg_cos desc, neg_id asc). Anchors with no same-label
    * peer are dropped (no positive to contrast against).
    *
    * Scale shape: the anchor batch broadcasts with its vectors; the
    * corpus streams once through the scored projection; negatives go
    * through the [[topKPerKey]] partition-local heaps and the positive
    * is a tie-free max_by struct agg — no corpus-sized window, no
    * self-join. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_lab"))
    val scored = corpus.select(col(idCol).as("n_id"),
        col(vecCol).as("n_vec"), col(labelCol).as("n_lab"))
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_lab"), col("n_id"), col("n_lab"),
        round(cosine(col("q_vec"), col("n_vec")), 4).as("cos"))
    // (cos, -n_id) pairs are unique per q_id, so max_by is tie-free
    val pos = scored.filter(col("q_lab") === col("n_lab"))
      .groupBy(col("q_id"))
      .agg(max_by(struct(col("n_id").as("pos_id"), col("cos").as("pos_cos")),
        struct(col("cos"), (-col("n_id")).as("__t"))).as("__p"))
      .select(col("q_id"), col("__p.pos_id"), col("__p.pos_cos"))
    topKPerKey(scored.filter(col("q_lab") =!= col("n_lab"))
        .select(col("q_id"), col("n_id"), col("cos")), k)
      .join(pos, Seq("q_id"))
      .select(col("q_id"), col("pos_id"), col("pos_cos"),
        col("n_id").as("neg_id"), col("cos").as("neg_cos"), col("rk"))
  }

  /** Per-label mean embedding ("domain centroid"): the semantic
    * profile of a source/topic/label slice, the input to
    * [[centroidSimilarity]]'s "which domains are close" matrix and to
    * centroid-seeded clustering.
    *
    * Scale shape: posexplode → one (label, pos)-keyed agg (map-side
    * combined — the exchange carries label-count × dim rows, not the
    * corpus) → per-label reassembly in pos order. The corpus never
    * collects; centroid count = label count. */
  def labelCentroids(df: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    centroidsFromSums(centroidSums(df, labelCol, vecCol), labelCol)

  /** The mergeable half of [[labelCentroids]]: per-(label, dimension)
    * component sums and counts. Sums over DISJOINT row sets add, so a
    * batch ingest never rescans history — the tokenCounts/q86
    * incremental pattern applied to embedding profiles (and the
    * per-micro-batch fold for a streaming domain monitor). */
  def centroidSums(df: DataFrame, labelCol: String,
                   vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))

  /** Add two sum tables (disjoint underlying rows). */
  def mergeCentroidSums(a: DataFrame, b: DataFrame,
                        labelCol: String): DataFrame =
    a.unionByName(b).groupBy(col(labelCol), col("pos"))
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))

  /** Finalize: mean per dimension, reassembled in pos order. */
  def centroidsFromSums(sums: DataFrame, labelCol: String): DataFrame =
    sums.groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"),
        (col("s") / col("n")).as("m")))),
        s => s.getField("m")).as("centroid"))

  /** Pairwise cosine between label centroids — the label-count²
    * similarity matrix (tiny: labels, not rows). Output:
    * (label_a, label_b, cos rounded 4), upper triangle only. */
  def centroidSimilarity(centroids: DataFrame, labelCol: String): DataFrame = {
    val a = centroids.select(col(labelCol).as("label_a"),
      col("centroid").as("__ca"))
    val b = centroids.select(col(labelCol).as("label_b"),
      col("centroid").as("__cb"))
    a.crossJoin(b).filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(cosine(col("__ca"), col("__cb")), 4).as("cos"))
  }

  /** Simplified (centroid-based) SILHOUETTE per cluster — the O(n·k)
    * clustering-quality audit that replaces classic silhouette's
    * O(n²) pairwise pass: `a(i)` = distance to own centroid, `b(i)` =
    * min distance to any OTHER centroid, `s(i) = (b−a)/max(a,b)` in
    * [−1, 1] (the simplified-silhouette form — the only variant that
    * survives a 100 TB corpus, and within a few percent of the exact
    * coefficient in practice). Distance is 4-decimal-rounded cosine
    * distance (1 − cos); `s` is quantized to 1e-4 fixed point PER
    * VECTOR before the per-cluster sum — the repo's cross-engine
    * determinism rule for anything that would otherwise be an
    * avg(double).
    *
    * Scale shape: one label-count×dim centroid agg, then the k-row
    * centroid table BROADCAST against the corpus — k codegen'd
    * cosines per vector, one per-(vector) agg keyed by id (map-side
    * combined, k rows in per id), one per-label agg. The corpus is
    * never self-joined. Output: (labelCol, n_vecs, sum_sil_fp,
    * mean_sil). */
  def silhouette(df: DataFrame, idCol: String, labelCol: String,
                 vecCol: String): DataFrame = {
    val cents = labelCentroids(df, labelCol, vecCol)
    val d = df.select(col(idCol), col(labelCol),
        col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(cents.select(col(labelCol).as("__cl"),
        col("centroid"))))
      .withColumn("__d",
        round(lit(1.0) - cosine(col("__v"), col("centroid")), 4) + lit(0.0))
    val ab = d.groupBy(col(idCol), col(labelCol))
      .agg(max(when(col(labelCol) === col("__cl"), col("__d"))).as("__a"),
        min(when(col(labelCol) =!= col("__cl"), col("__d"))).as("__b"))
    val sil = ab.withColumn("__s",
      when(greatest(col("__a"), col("__b")) === 0.0, lit(0L))
        .otherwise(round(lit(10000.0) * (col("__b") - col("__a"))
          / greatest(col("__a"), col("__b"))).cast("long")))
    sil.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__s")).as("sum_sil_fp"))
      .select(col(labelCol), col("n_vecs"), col("sum_sil_fp"),
        (round(col("sum_sil_fp") / (col("n_vecs") * lit(10000.0)), 4)
          + lit(0.0)).as("mean_sil"))
  }

  /** Per-label centroid DRIFT across two snapshots — the standard
    * corpus-monitoring readout after a batch ingest: cos(centroid_t,
    * centroid_{t-1}) per label, where centroid_t comes from the
    * incrementally merged sums ([[mergeCentroidSums]]) so history is
    * never rescanned. Labels present in only one snapshot drop (an
    * inner join — drift is undefined for them; a brand-new label is
    * its own alert, surfaced by the label-count diff, not a cosine).
    * Output: (labelCol, drift rounded 4). Cost: label-count-sized
    * join, tiny by construction. */
  def centroidDrift(prev: DataFrame, cur: DataFrame,
                    labelCol: String): DataFrame = {
    val a = prev.select(col(labelCol), col("centroid").as("__cp"))
    val b = cur.select(col(labelCol), col("centroid").as("__cc"))
    a.join(b, Seq(labelCol))
      .select(col(labelCol),
        round(cosine(col("__cp"), col("__cc")), 4).as("drift"))
  }

  def lshSimilarPairsBanded(corpus: DataFrame, idCol: String, vecCol: String,
                            bitsPerBand: Int, bands: Int, threshold: Double,
                            maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val bandBuckets = array((0 until bands).map(bd =>
      struct(lit(bd).as("band"),
        signBucketAt(col(vecCol), bd * bitsPerBand, bitsPerBand).as("bucket"))): _*)
    val exploded = corpus
      .select(col(idCol), col(vecCol), explode(bandBuckets).as("bb"))
      .select(col(idCol), col(vecCol), col("bb.band"), col("bb.bucket"))
    val guarded =
      if (maxBucketSize == Int.MaxValue) exploded
      else {
        val counts = exploded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBucketSize)
        exploded.join(broadcast(counts.select(col("band"), col("bucket"))),
          Seq("band", "bucket"))
      }
    val a = guarded.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = guarded.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b") // a pair may collide in several bands
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ---- 1-bit (sign) binary embeddings -------------------------------

  /** 64-bit sign signature: bit j set iff component j+1 > 0 — the
    * 1-bit quantization of a 64-dim embedding. One BIGINT per vector
    * (a 32× compression over float32), so a 10⁹-vector corpus's
    * signature table is 8 GB — scannable by every executor without an
    * index. Pure sign COMPARISONS of identical float bits, so the
    * signature (unlike any float arithmetic) is bit-equal across
    * engines. DuckDB mirror: `list_sum([CASE WHEN embedding[j] > 0
    * THEN 1::BIGINT << (j-1) ELSE 0 END for j in range(1, 65)])` —
    * with bit 63 spelled as the min-long literal, since DuckDB
    * raises on `1 << 63` where Spark's shiftleft wraps to
    * MIN_VALUE (same bit pattern, so the signatures still agree). */
  def signSignature64(vecCol: String): Column =
    expr(s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
            | (acc, j) -> acc + IF(element_at($vecCol, j + 1) > CAST(0 AS FLOAT),
            |                      shiftleft(CAST(1 AS BIGINT), j),
            |                      CAST(0 AS BIGINT)))""".stripMargin)

  /** Top-k per query over binary signatures by Hamming distance
    * (`bit_count(xor)` — two instructions per candidate). Same heap
    * shape as [[bruteForceTopKScalable]]: the signature scan is
    * embarrassingly parallel and only |partitions|×|queries|×k
    * candidates reach the rank. Ties break by n_id ascending.
    * Input: sigs (n_id, sig), queries (q_id, sig).
    * Output: (q_id, n_id, hamming, rk). */
  def hammingTopK(sigs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = sigs.crossJoin(
        broadcast(queries.select(col("q_id"), col("sig").as("__qsig"))))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (-bit_count(col("sig").bitwiseXOR(col("__qsig"))).cast("double"))
          .as("cos"))
    topKPerKey(scored, k)
      .select(col("q_id"), col("n_id"),
        (-col("cos")).cast("long").as("hamming"), col("rk"))
  }
}
