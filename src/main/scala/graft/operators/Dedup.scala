package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, each designed
  * for the 100 TB regime:
  *
  *  - exact: one hash-shuffle on a 16-byte digest (never on the full
  *    text), map-side partial agg;
  *  - MinHash+LSH: per-doc signatures (narrow, embarrassingly
  *    parallel) → band-bucket self-join. The join key (band, sig) is
  *    high-cardinality, so the shuffle is well spread; candidate
  *    pairs — not all O(n²) pairs — are the only thing materialized;
  *  - n-gram Jaccard: exact verification joined only against LSH
  *    candidates;
  *  - SimHash: one narrow agg per (doc, bit), then a 64-row-per-doc
  *    rollup to a single long.
  */
object Dedup {

  /** Exact duplicate groups: digest → canonical (min) id + group size.
    * `dropDuplicates(textCol)` is the kept-rows view of the same op. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The shared shingle-pipeline intermediate: DISTINCT per-document
    * shingles, carried as hashes only — `(id, md5_0, md5_1, shash)`
    * where md5_k = md5(k + "|" + shingle) (the MinHash family) and
    * shash = xxhash64(shingle) (an 8-byte join key for set
    * intersection — shuffling longs instead of shingle strings
    * shrinks the Jaccard shuffle ~5×).
    *
    * One explode + ONE shuffle (the distinct) produces everything the
    * MinHash signatures, LSH candidates, and exact Jaccard verify all
    * need — callers materialize this once per corpus instead of
    * re-deriving the explode per consumer. Distinctness is safe for
    * MinHash too: min over a set equals min over the multiset.
    *
    * (xxhash64 collisions could in principle add a spurious
    * intersection; at ~2⁻⁶⁴ per shingle pair that is ignorable even
    * at 100 TB corpus scale.) */
  /** Spread a SMALL input across the cluster before a compute-heavy
    * narrow stage (a single-small-file scan would otherwise run on one
    * task, and AQE would coalesce a countless repartition too). Inputs
    * big enough to scan into at least cluster parallelism pass through
    * untouched — no gratuitous exchange on data that is already spread
    * (at sf0.1 the unconditional repartition cost q20 an extra
    * exchange for nothing).
    *
    * The check reads the optimizer's SIZE ESTIMATE, not
    * `rdd.getNumPartitions` — the latter materializes AQE query
    * stages for non-scan inputs, silently executing upstream shuffles
    * at plan-build time. */
  private def spread(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxPart = org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size >= BigInt(maxPart) * par) df
    else df.repartition(par, col(idCol))
  }

  def shingleTable(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3): DataFrame = {
    spread(df, idCol)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("shingle"))
      .select(col(idCol),
        md5(concat(lit("0|"), col("shingle"))).as("md5_0"),
        md5(concat(lit("1|"), col("shingle"))).as("md5_1"),
        xxhash64(col("shingle")).as("shash"))
      .distinct()
  }

  /** MinHash band signatures from a [[shingleTable]]: 8 min-hashes,
    * banded 2 at a time into 4 concatenated signatures. Output:
    * (id, band, sig) — one map-side-combined shuffle on the doc id.
    *
    * Hash family: hash j is the 8-hex-char slice j%4 of
    * md5((j/4) + "|" + shingle) — two md5 calls per shingle instead
    * of eight, no hash-id crossJoin. 32-bit hex slices compare
    * lexicographically as unsigned ints, and md5 is identical in
    * DuckDB, so the oracle stays exact. */
  private val NumHashes = 8

  /** The per-document 8-min-hash vector (id, h0..h7) from a
    * [[shingleTable]] — the raw sketch behind both the banded
    * signatures and the similarity estimator. */
  private def minhashVector(sh: DataFrame, idCol: String): DataFrame = {
    val minCols = (0 until NumHashes).map(j =>
      min(substring(col(s"md5_${j / 4}"), 1 + 8 * (j % 4), 8)).as(s"h$j"))
    sh.groupBy(col(idCol)).agg(minCols.head, minCols.tail: _*)
  }

  def signaturesFromShingles(sh: DataFrame, idCol: String): DataFrame = {
    val mh = minhashVector(sh, idCol)
    val stackExpr = (0 until NumHashes / 2).map(b =>
      s"CAST($b AS BIGINT), concat(h${2 * b}, '|', h${2 * b + 1})").mkString(", ")
    mh.selectExpr(idCol, s"stack(${NumHashes / 2}, $stackExpr) AS (band, sig)")
  }

  /** Estimator calibration: for each candidate pair, the MinHash
    * Jaccard ESTIMATE (matching min-hashes / 8) next to the exact
    * Jaccard and their absolute error — the "can I trust the sketch"
    * audit run before a threshold is chosen. The estimator's variance
    * is √(J(1−J)/k), so with k = 8 errors up to ~0.35 are EXPECTED —
    * the spec pins the aggregate, not per-pair, behavior.
    *
    * Output: (id_a, id_b, est, jaccard, abs_err). Cost: the exact
    * verify is the q19 join (candidates only); the estimate side joins
    * the 8-column sketch — both bounded by the candidate set. */
  def minhashCalibration(sh: DataFrame, pairs: DataFrame,
                         idCol: String): DataFrame = {
    val mh = minhashVector(sh, idCol)
    val ha = mh.select(col(idCol).as("id_a") +:
      (0 until NumHashes).map(j => col(s"h$j").as(s"__ha$j")): _*)
    val hb = mh.select(col(idCol).as("id_b") +:
      (0 until NumHashes).map(j => col(s"h$j").as(s"__hb$j")): _*)
    val matches = (0 until NumHashes).map(j =>
      when(col(s"__ha$j") === col(s"__hb$j"), 1).otherwise(0))
      .reduce(_ + _)
    val est = pairs.join(ha, Seq("id_a")).join(hb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / NumHashes).as("est"))
    est.join(ngramJaccardFromShingles(sh, pairs, idCol), Seq("id_a", "id_b"))
      .withColumn("abs_err", round(abs(col("est") - col("jaccard")), 4))
  }

  /** Per-document MinHash band signatures straight from text (the
    * one-shot convenience path; pipelines sharing the shingle set
    * should materialize [[shingleTable]] and call
    * [[signaturesFromShingles]]). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3): DataFrame =
    signaturesFromShingles(shingleTable(df, idCol, textCol, shingleN), idCol)

  /** LSH candidate pairs: documents sharing any band signature.
    * Output: (id_a, id_b) with id_a < id_b, distinct.
    *
    * Implemented as bucket-collect + in-bucket pair expansion rather
    * than a self-join — the signature pipeline is evaluated ONCE, and
    * only the (band, sig) shuffle remains.
    *
    * Skew guard: a bucket larger than `maxBucketSize` (e.g. thousands
    * of boilerplate-identical documents at corpus scale) would expand
    * B²/2 pairs; such buckets fall back to STAR pairing — every member
    * linked to the bucket's minimum id, B−1 pairs — which preserves
    * the connected components a dedup clustering consumes while
    * bounding output linearly. The default keeps exact all-pairs
    * semantics (and the DuckDB oracle). */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
                        maxBucketSize: Int = Int.MaxValue): DataFrame =
    sigs.groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(when(size(col("ids")) <= maxBucketSize, expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"""
          .stripMargin))
        .otherwise(expr(
          """transform(slice(ids, 2, size(ids)),
            |  y -> struct(ids[0] AS id_a, y AS id_b))""".stripMargin))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** Incremental LSH candidates: pairs involving at least one NEW
    * document — the batch-ingest shape of minhash dedup. A corpus
    * deployment persists its signature table once; each arriving batch
    * computes signatures for ITS documents only and band-joins them
    * against the full table. Old–old pairs are never recomputed, so
    * per-batch cost is O(batch × bucket-hit), not O(corpus²) — and the
    * small new side broadcasts under AQE.
    *
    * `isNew` marks the batch (any predicate over the signature rows,
    * e.g. an ingest-date column or an id watermark). Output matches
    * [[lshCandidatePairs]]: (id_a, id_b), id_a < id_b, distinct —
    * restricted to pairs with a new member. The union of these pairs
    * with the previous corpus's pairs IS the full pair set
    * (spec-pinned), which is what makes incremental clustering sound.
    *
    * Skew guard, mirroring [[lshCandidatePairs]]: a (band, sig) bucket
    * holding more than `maxBucketHits` corpus rows (boilerplate-
    * identical documents) would emit that many pairs PER new doc that
    * lands in it; with the cap, such buckets are excluded. Only the
    * HOT bucket set (count > cap) is broadcast — it is tiny by
    * construction (each member exceeds the cap), whereas the non-hot
    * complement is O(corpus × bands) and would OOM the driver if
    * collected; the exclusion is a broadcast left-anti join. Documented
    * recall loss, exact by default. */
  def lshCandidatePairsIncremental(sigs: DataFrame, idCol: String,
                                   isNew: Column,
                                   maxBucketHits: Int = Int.MaxValue): DataFrame = {
    val all = sigs.select(col("band"), col("sig"), col(idCol).as("__oid"))
    val guarded =
      if (maxBucketHits == Int.MaxValue) all
      else {
        val hot = all.groupBy(col("band"), col("sig"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > maxBucketHits)
        all.join(broadcast(hot.select(col("band"), col("sig"))),
          Seq("band", "sig"), "left_anti")
      }
    val n = sigs.filter(isNew)
      .select(col("band"), col("sig"), col(idCol).as("__nid"))
    n.join(guarded, Seq("band", "sig"))
      .filter(col("__nid") =!= col("__oid"))
      .select(least(col("__nid"), col("__oid")).as("id_a"),
        greatest(col("__nid"), col("__oid")).as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity from a [[shingleTable]],
    * computed only for `pairs` (normally LSH candidates):
    * |A∩B| / |A∪B| over distinct shingle sets. The intersection
    * joins on the 8-byte `shash` key — never on shingle strings.
    * Output: (id_a, id_b, jaccard rounded to 4). */
  def ngramJaccardFromShingles(sh: DataFrame, pairs: DataFrame,
                               idCol: String): DataFrame = {
    val ds = sh.select(col(idCol).as("sid"), col("shash"))
    val sizes = ds.groupBy(col("sid")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(ds.as("sa"), col("id_a") === col("sa.sid"))
      .join(ds.as("sb"), col("id_b") === col("sb.sid") &&
        col("sa.shash") === col("sb.shash"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col("na.sid"))
      .join(sizes.as("nb"), col("id_b") === col("nb.sid"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("na.n_sh") + col("nb.n_sh") - col("inter")), 4)
          .as("jaccard"))
  }

  /** Asymmetric set CONTAINMENT over the same shingle machinery:
    * |A∩B|/|A| and |A∩B|/|B| per candidate pair. Catches SUBSET
    * duplicates — a truncated re-crawl of B, a page quoted whole
    * inside a larger one — whose symmetric Jaccard is diluted below
    * any sane threshold by the size imbalance (A⊂B gives
    * J = |A|/|B| → 0 as B grows, while containment_a stays 1.0).
    * The standard companion metric to [[ngramJaccardFromShingles]]
    * in crawl dedup; same scale shape (joins only LSH candidates,
    * on 8-byte hashes). Output: (id_a, id_b, contain_a, contain_b,
    * jaccard) — all three metrics from one intersection pass. */
  def containmentFromShingles(sh: DataFrame, pairs: DataFrame,
                              idCol: String): DataFrame = {
    val ds = sh.select(col(idCol).as("sid"), col("shash"))
    val sizes = ds.groupBy(col("sid")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(ds.as("sa"), col("id_a") === col("sa.sid"))
      .join(ds.as("sb"), col("id_b") === col("sb.sid") &&
        col("sa.shash") === col("sb.shash"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col("na.sid"))
      .join(sizes.as("nb"), col("id_b") === col("nb.sid"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / col("na.n_sh"), 4).as("contain_a"),
        round(col("inter") / col("nb.n_sh"), 4).as("contain_b"),
        round(col("inter") / (col("na.n_sh") + col("nb.n_sh") - col("inter")), 4)
          .as("jaccard"))
  }

  /** One-shot n-gram Jaccard straight from text (convenience path;
    * pipelines should share a materialized [[shingleTable]]). */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, shingleN: Int = 3): DataFrame =
    ngramJaccardFromShingles(shingleTable(df, idCol, textCol, shingleN),
      pairs, idCol)

  /** Connected components over a pair list — the final dedup step
    * that turns verified near-duplicate PAIRS into CLUSTERS with a
    * canonical keep id (the component minimum).
    *
    * Iterative min-label propagation: each round every node takes the
    * minimum label among itself and its neighbors; converged when no
    * label changes. Rounds are plain shuffled joins (distributed,
    * no driver-side graph), and the round count is the component
    * diameter — for near-dup clusters (dense, tiny) a handful.
    * Output: (id, keep_id) for every node that appears in a pair. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Materialized ONCE with the lineage CUT (eager localCheckpoint,
    // NOT persist): every propagation round re-reads the edge set.
    // A persist avoids recompute but keeps the full upstream PLAN
    // alive — each round's join then re-analyzes/optimizes a plan
    // tree containing the whole candidate-generation lineage, and on
    // an iterative operator that driver-side planning cost dominates
    // end to end (profiled: CC over a 9-pair banded-LSH lineage took
    // 23s uncached, 47s persisted, 1.5s once the plan was severed —
    // the rounds were never the cost, the per-round replanning was).
    // The checkpointed edge set enters every round as a leaf scan.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(mem)
    labels.count() // materialize before the loop re-reads it
    // One lazy propagation round: each node takes the min label over
    // itself and its neighbors; monotone (labels only decrease).
    def propagate(l: DataFrame): DataFrame = {
      val neighborMin = edges
        .join(l.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      l.select(col("id"), col("label")).join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    }
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // TWO lazy rounds per materialized action: on batch-sized delta
      // graphs the per-job round trip dominates the round's compute,
      // and near-dup components are shallow, so paying a full job per
      // round for the convergence bit doubles the wall clock. The
      // block's own last two states carry the bit — propagation is
      // monotone, so "round k changed nothing" IS the fixed point,
      // and comparing the block's final round against its predecessor
      // (a projection inside the same plan, not a join back to the
      // previous action's result) detects it with zero extra jobs.
      val rounds = math.min(2, maxIter - iter)
      val prev = (1 until rounds).foldLeft(labels.select(col("id"), col("label")))(
        (l, _) => propagate(l))
      val neighborMin = edges
        .join(prev.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val step = prev.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("__chg"))
      // Each block's plan chains the previous block's; localCheckpoint
      // every few blocks truncates the lineage so plan depth stays
      // bounded and an executor loss replays a bounded suffix, not
      // the whole chain.
      val next =
        if ((iter / 2 + 1) % 3 == 0) step.localCheckpoint(true)
        else step.persist(mem)
      changed = next.filter(col("__chg")).count()
      labels.unpersist(blocking = false)
      labels = next
      iter += rounds
    }
    if (changed == 0) {
      // Materialize the result with its lineage CUT (localCheckpoint,
      // not persist): unpersisting the internal labels/edges below
      // triggers CacheManager's dependent-entry recompile, which
      // silently INVALIDATES a persisted dependent result — every
      // consumer then replays the whole iterative chain (burned a
      // bench round on q41: 0.7s → 8s). A checkpointed result has no
      // CacheManager entry to invalidate; free its blocks with
      // GraftSqlBridge.unpersistBackingRdds when done.
      val out = labels.select(col("id"), col("label").as("keep_id"))
        .localCheckpoint(true)
      labels.unpersist(blocking = false)
      org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(edges)
      out
    } else {
      // Diameter exceeded the propagation budget (min-label rounds =
      // component diameter — fine for dense near-dup clusters, fatal
      // for a pathological chain, e.g. crawl-session dedup): fall back
      // to alternating large-star/small-star contraction, which
      // converges in O(log² n) rounds regardless of diameter.
      labels.unpersist(blocking = false)
      val out = starComponents(edges).localCheckpoint(true)
      org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(edges)
      out
    }
  }

  /** Incremental connected components — the missing half of the
    * batch-ingest dedup story that [[lshCandidatePairsIncremental]]
    * opens: given the EXISTING label table (id, keep_id) and the new
    * batch's candidate pairs, produce the label table of the union
    * graph WITHOUT re-running CC over all historical pairs.
    *
    * Contraction argument: each existing component is connectivity-
    * equivalent to its root (keep_id = component minimum), so the
    * union graph's components are exactly the components of the DELTA
    * graph whose nodes are {roots touched by a new edge} ∪ {new ids},
    * with new edges mapped endpoint → root. That graph has at most
    * 2·|newPairs| nodes — batch-sized, NOT corpus-sized — and the full
    * CC machinery (propagation + star fallback) runs only on it. The
    * component minimum over old roots and raw new ids IS the union
    * component's global minimum, so keep-id semantics are preserved.
    *
    * Scale shape: `labels` (corpus-sized) is never shuffled — it is
    * semi-joined against the broadcast batch ids to extract the
    * touched rows, and re-labeled with one broadcast hash join against
    * the delta root map; untouched components keep their rows
    * byte-identical (spec-pinned). Per-batch cost is O(batch), versus
    * O(corpus) for the from-scratch recompute.
    *
    * Output: (id, keep_id) for every id in `labels` plus every id in
    * `newPairs` — identical (spec + q59 oracle) to running
    * [[connectedComponents]] over the union of all pairs. */
  def incrementalComponents(labels: DataFrame, newPairs: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("keep_id"))
    // Materialized ONCE (batch-sized): batchIds, the contraction join,
    // and the delta CC's edge set all re-read the new pairs — lazy,
    // each would replay the upstream LSH candidate lineage.
    val np = newPairs.select(col("id_a"), col("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .localCheckpoint(true)
    val batchIds = np.select(col("id_a").as("id"))
      .union(np.select(col("id_b").as("id"))).distinct()
    // the touched slice of the label table: batch-sized, safe to
    // broadcast; the big table only streams through one semi-join
    // scan. Eager localCheckpoint (not persist): consumers reuse the
    // materialized slice with no CacheManager entry to invalidate.
    val touched = lab.join(broadcast(batchIds), Seq("id"), "left_semi")
      .localCheckpoint(true)
    // contract each endpoint to its current root (itself when unseen)
    val contracted = np
      .join(broadcast(touched.select(col("id").as("id_a"), col("keep_id").as("__ra"))),
        Seq("id_a"), "left")
      .join(broadcast(touched.select(col("id").as("id_b"), col("keep_id").as("__rb"))),
        Seq("id_b"), "left")
      .select(coalesce(col("__ra"), col("id_a")).as("id_a"),
        coalesce(col("__rb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")) // intra-component edges are no-ops
    // CC over the batch-sized delta graph only
    val delta = connectedComponents(contracted)
    val rootMap = delta
      .select(col("id").as("__old_root"), col("keep_id").as("__new_root"))
    // re-label: only components whose root appears in the delta move;
    // everything else keeps its exact old row
    val updatedOld = lab
      .join(broadcast(rootMap), lab("keep_id") === col("__old_root"), "left")
      .select(lab("id"),
        coalesce(col("__new_root"), lab("keep_id")).as("keep_id"))
    // brand-new ids (no old label): their supernode is their own id
    val newIds = batchIds.join(broadcast(touched.select(col("id"))),
      Seq("id"), "left_anti")
    val newLabels = newIds
      .join(broadcast(rootMap), newIds("id") === col("__old_root"), "left")
      .select(newIds("id"), coalesce(col("__new_root"), col("id")).as("keep_id"))
    updatedOld.union(newLabels)
  }

  /** DECREMENTAL connected components: the label table after DELETING
    * a set of nodes — the dedup family's right-to-be-forgotten fold,
    * the inverse of [[incrementalComponents]]. Deleting nodes can only
    * SPLIT the components that contained them, so every untouched
    * component keeps its EXACT old row and the CC recompute is scoped
    * to the affected components' surviving members: work ∝ the edges
    * of components containing a deleted node, never the full graph.
    * (With the edge table bucketed by component label — the standing
    * artifact a batch-dedup deployment keeps anyway — the edge scan
    * prunes to affected buckets too.)
    *
    * `labels` (id, keep_id) is the standing table; `pairs`
    * (id_a, id_b) the surviving candidate-pair source. LSH pair
    * existence depends only on the two endpoint signatures, so
    * full-graph pairs filtered to survivors ARE the filtered-corpus
    * pairs — the output equals a from-scratch CC over the remaining
    * docs (q281's oracle). Survivors whose every partner was deleted
    * drop out of the table, exactly as a from-scratch build over the
    * survivors would drop them. */
  def decrementalComponents(labels: DataFrame, pairs: DataFrame,
                            deleted: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("keep_id"))
    val del = deleted.select(col("id")).distinct().localCheckpoint(true)
    // labels of components that lost a member (bounded by |deleted|)
    val affected = lab.join(del, Seq("id"), "left_semi")
      .select(col("keep_id")).distinct().localCheckpoint(true)
    // surviving members of affected components (∝ affected comps)
    val survivors = lab.join(affected, Seq("keep_id"), "left_semi")
      .join(del, Seq("id"), "left_anti")
      .select(col("id")).localCheckpoint(true)
    // edges with BOTH endpoints surviving inside an affected
    // component (edges never cross components, so two semi-joins
    // against the affected-survivor set scope the scan exactly)
    val e = pairs.select(col("id_a"), col("id_b"))
      .join(survivors.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(survivors.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    // untouched components: exact old rows, no recompute
    lab.join(affected, Seq("keep_id"), "left_anti")
      .select(col("id"), col("keep_id"))
      .unionByName(connectedComponents(e))
  }

  /** Alternating large-star/small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond"): each
    * round rewires every node's larger (large-star) or not-larger
    * (small-star) neighbors to its minimum neighborhood label. The
    * edge set contracts toward a star forest — every node directly
    * linked to its component minimum — in O(log² n) rounds, making it
    * the deep-graph path where diameter-bound label propagation
    * cannot converge. `edges` must be symmetric and self-loop-free. */
  private def starComponents(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    val allNodes = edges.select(col("src").as("id")).distinct()
    // per-node minimum over the closed neighborhood Γ(u) ∪ {u}
    def mins(e: DataFrame): DataFrame =
      e.groupBy(col("src")).agg(min(col("dst")).as("__mn"))
        .select(col("src"), least(col("__mn"), col("src")).as("m"))
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val j = e.join(mins(e), Seq("src"))
      val emitted =
        if (large) j.filter(col("dst") > col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
        else j.filter(col("dst") < col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
          .union(mins(e).select(col("src"), col("m").as("dst")))
      sym(emitted)
    }
    // cheap set fingerprint for the convergence check: (|E|, ⊕ h(e))
    // — xor, not sum: ANSI mode makes a BIGINT sum of hashes overflow
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("src"), col("dst")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var cur = edges.localCheckpoint(true)
    var fp = fingerprint(cur)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // localCheckpoint, not persist: each round's plan builds on the
      // last — without truncation plan depth grows linearly
      val next = star(star(cur, large = true), large = false).localCheckpoint(true)
      val nfp = fingerprint(next)
      converged = nfp == fp
      cur = next
      fp = nfp
      round += 1
    }
    // star forest: every node's closed-neighborhood min IS its root
    val labels = mins(cur).select(col("src").as("id"), col("m").as("keep_id"))
    // nodes whose component fully contracted away are their own root
    allNodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("keep_id"), col("id")).as("keep_id"))
  }

  /** Benchmark decontamination: documents sharing any word n-gram
    * with a benchmark/test corpus, plus the count of distinct
    * overlapping n-grams — the standard "did my training data leak
    * the eval set" filter (13-gram overlap in the GPT-3 lineage;
    * `shingleN` is the knob). Output: (id, n_hits), contaminated
    * documents only.
    *
    * Scale shape: the BENCHMARK side is reduced to distinct n-grams —
    * tiny relative to any training corpus — and broadcast, so the
    * corpus side is never shuffled on strings: explode is narrow, the
    * broadcast join filters to hit rows only, and the single exchange
    * is the per-document distinct-count over those hits. */
  def contamination(df: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    shingleN: Int = 3): DataFrame = {
    val bad = bench
      .select(explode(shingles(col(benchTextCol), shingleN)).as("sh"))
      .distinct()
    spread(df, idCol)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
      .join(broadcast(bad), Seq("sh"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).as("n_hits"))
  }

  /** [[contamination]] for reference sets too large to broadcast as a
    * hash relation — the Bloom cascade [[contaminationFraction]]'s
    * scaladoc points to. A train-vs-everything leakage sweep or a
    * multi-benchmark union can carry billions of distinct n-grams;
    * what IS still broadcastable at that size is a Bloom filter over
    * their hashes (~9.6 bits/key at 1% fpp). The cascade:
    *
    *   1. Bloom build over the reference's distinct n-gram hashes
    *      (distributed partial aggregation, [[BloomPrune]]'s native
    *      codegen'd path);
    *   2. scan-side prune of the corpus n-gram stream — ~99% of
    *      non-contaminated rows die before any exchange;
    *   3. exact hash-join confirm of the survivors, which removes the
    *      Bloom's false positives.
    *
    * Bloom filters have NO false negatives, so the cascade is
    * lossless: output == [[contamination]] exactly (q231 runs q46's
    * oracle verbatim to prove it through the gate). The confirm join
    * runs on 8-byte xxhash64 keys without a broadcast hint — n-gram
    * strings never shuffle, and AQE picks the strategy for whatever
    * survives the prune. */
  def contaminationBloom(df: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         shingleN: Int = 3,
                         expectedBenchNgrams: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val bad = bench
      .select(explode(shingles(col(benchTextCol), shingleN)).as("sh"))
      .select(xxhash64(col("sh")).as("shh"))
      .distinct()
    val corpusSh = spread(df, idCol)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("shh"))
    BloomPrune.prune(corpusSh, col("shh"), bad, col("shh"),
        expectedBenchNgrams, fpp)
      .join(bad, Seq("shh"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("shh")).as("n_hits"))
  }

  /** Soft decontamination: per-document fraction of its DISTINCT word
    * n-grams that also occur anywhere in a benchmark corpus — the
    * graded companion to [[contamination]]'s any-hit filter. A single
    * shared 13-gram is noise on a long document but damning on a short
    * one; the fraction supports a tunable cutoff instead of
    * drop-on-first-hit. Output: (id, n_sh, n_hit, frac) for EVERY
    * corpus document, zero-hit rows included — a curation gate filters
    * on `frac` downstream.
    *
    * Scale shape: both sides reduce to 8-byte xxhash64 n-gram keys
    * before any join — n-gram STRINGS never shuffle. The benchmark
    * side is distinct-hashed and broadcast (tiny vs any training
    * corpus); the corpus side folds to per-document distinct hashes,
    * so the one exchange carries (id, hash) pairs and the hit test is
    * a map-side broadcast probe ahead of the per-document count.
    *
    * `broadcastBench = false` drops the broadcast hint for reference
    * sets that are NOT small — e.g. a train-vs-test leakage audit,
    * where the "benchmark" is the train split: the join still runs on
    * 8-byte hashes, AQE picks the strategy, and at true web scale the
    * pre-filter of choice is a Bloom filter over the train hashes. */
  def contaminationFraction(df: DataFrame, idCol: String, textCol: String,
                            bench: DataFrame, benchTextCol: String,
                            shingleN: Int = 3,
                            broadcastBench: Boolean = true): DataFrame = {
    val bad = bench
      .select(explode(shingles(col(benchTextCol), shingleN)).as("sh"))
      .select(xxhash64(col("sh")).as("shh"))
      .distinct()
      .withColumn("hit", lit(1L))
    spread(df, idCol)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("shh"))
      .distinct()
      .join(if (broadcastBench) broadcast(bad) else bad, Seq("shh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .withColumn("frac", round(col("n_hit") / col("n_sh"), 4))
  }

  /** Inter-document repetition: per document, the fraction of its
    * n-gram OCCURRENCES whose n-gram appears in at least `minDocs`
    * distinct documents — the memorization-risk / boilerplate-density
    * metric (high frac ⇒ the document is assembled from corpus-common
    * phrasing even when no single near-dup partner exists, the case
    * pairwise dedup can't see). Output: (id, n_occ, n_dup, frac).
    *
    * Scale shape: document frequency is computed over 8-byte xxhash64
    * n-gram keys — strings never shuffle — and occurrences fold to
    * per-(id, hash) counts BEFORE the frequency join, so join input is
    * bounded by distinct n-grams per document, not token count. The
    * frequency side is corpus-vocabulary-sized (Heaps-sublinear); AQE
    * broadcasts it when small, and past that the join is
    * hash-partitioned on the 8-byte key. The occurrence subtree feeds
    * both aggregations — pass a persisted `df` to pay the tokenize
    * once, as [[TextPipelineQueries]] does with its shingle cache. */
  def duplicatedNgramFraction(df: DataFrame, idCol: String, textCol: String,
                              shingleN: Int = 3, minDocs: Int = 2): DataFrame = {
    val occ = spread(df, idCol)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
      .select(col(idCol), xxhash64(col("sh")).as("shh"))
      .groupBy(col(idCol), col("shh"))
      .agg(count(lit(1)).as("n"))
    // occ is one row per (id, shh), so document frequency is a plain count
    val dup = occ.groupBy(col("shh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("shh"), lit(1L).as("dup"))
    occ.join(dup, Seq("shh"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_occ"),
        coalesce(sum(when(col("dup").isNotNull, col("n"))), lit(0L)).as("n_dup"))
      .withColumn("frac", round(col("n_dup") / col("n_occ"), 4))
  }

  /** Per-document SimHash of `bits` bits (frequency-weighted token
    * votes; deterministic salted-md5 bit hashes). Output: (id, simhash).
    *
    * All `bits` votes are aggregate COLUMNS over one token stream —
    * not a crossJoin with a bit table, which multiplied the shuffled
    * row count by `bits` and needed a second rollup shuffle. One
    * map-side-combined exchange on the doc id; the per-token hash
    * work is identical. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    val votes = (0 until bits).map(b =>
      sum(simhashVote(lit(b), col("w"))).as(s"s$b"))
    val packed = (0 until bits).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    spread(df, idCol)
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** Incremental EXACT dedup — the batch-ingest form of the digest
    * modality (MinHash has [[lshCandidatePairsIncremental]], ANN has
    * `IvfIndex.appendSaved`; exact dedup completes the set). The
    * corpus keeps a digest→canonical-id table (16-byte md5, built
    * once, extended per batch); an arriving batch hashes ITS text
    * only and joins on the digest — the corpus text is never
    * re-hashed, never shuffled, and the batch side broadcasts under
    * AQE. Output: (idCol, dup_of) for every batch document whose
    * digest matches a prior corpus document's.
    *
    * `key` picks the digest grain: the full text column for strict
    * byte identity, a canonical form (lower + whitespace collapse,
    * the q54 canon) for case/spacing-insensitive identity, or a
    * leading-prefix slice — the cheap crawl-scale first pass that
    * catches truncated/re-crawled copies of the same page. */
  def exactIncrementalDups(corpus: DataFrame, batch: DataFrame,
                           idCol: String, key: Column): DataFrame = {
    val digests = corpus
      .select(md5(key).as("__dg"), col(idCol))
      .groupBy(col("__dg")).agg(min(col(idCol)).as("dup_of"))
    batch.select(col(idCol), md5(key).as("__dg"))
      .join(digests, Seq("__dg"))
      .select(col(idCol), col("dup_of"))
  }

  /** SimHash near-duplicate pairs — the pairing half [[simhash]] was
    * missing (MinHash has [[lshCandidatePairs]], embeddings have
    * sign-LSH; fingerprints stopped at values). The `bits`-wide
    * fingerprint splits into `bands` equal bit-slices; documents
    * sharing ANY slice become candidates — literally routed through
    * [[lshCandidatePairs]] on a (band, sig, id) frame, inheriting its
    * bucket-collect shape, distinct semantics, and hot-bucket star
    * cap — then candidates verify by Hamming distance
    * (`bit_count(xor)`, one codegen'd projection; the fingerprint
    * table joins back on the 8-byte id, never the text).
    *
    * Recall contract (pigeonhole): hamming <= bands−1 is ALWAYS
    * caught — fewer differing bits than bands leaves some band
    * untouched. Pairs with hamming in [bands, maxHamming] surface
    * only when their differing bits cluster inside one band
    * (spec-pinned, both directions). More bands buy recall with more
    * bucket volume — the same dial as MinHash banding. */
  def simhashPairs(sims: DataFrame, idCol: String, simCol: String = "simhash",
                   bits: Int = 16, bands: Int = 2, maxHamming: Int = 3,
                   maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(bands >= 1 && bits % bands == 0,
      s"bits ($bits) must split evenly into bands ($bands)")
    val width = bits / bands
    val mask = (1L << width) - 1
    val sliced = (0 until bands).map { b =>
      sims.select(col(idCol), lit(b).as("band"),
        shiftrightunsigned(col(simCol), b * width).bitwiseAND(lit(mask))
          .as("sig"))
    }.reduce(_ union _)
    val cand = lshCandidatePairs(sliced, idCol, maxBucketSize)
    val sh = sims.select(col(idCol), col(simCol))
    cand
      .join(sh.select(col(idCol).as("id_a"), col(simCol).as("__sa")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col(simCol).as("__sb")), Seq("id_b"))
      .withColumn("hamming",
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Semantic (embedding-space) dedup, SemDeDup-style: coarse-cluster
    * the embedding space, then inside each cluster drop every vector
    * that has an EARLIER-id near-duplicate (cosine ≥ `minCos`). The
    * clusters only BOUND the pair search — a cross-cluster near-dup
    * is missed by construction (that recall/cost dial is `k`, exactly
    * the SemDeDup paper's design), so seed quality trades recall,
    * never correctness of what IS reported.
    *
    * Seeds are md5-rank picks from the corpus itself (train-free,
    * seedless-reproducible, the [[Pq.seedCodebook]] idiom); swap in
    * `IvfIndex.buildFrom` centroids when cluster balance matters —
    * the downstream shape is identical.
    *
    * Scale shape: assignment is the native `nearest_centroid`
    * projection (no join, no window, stays in whole-stage codegen);
    * the pair search shuffles once on `cluster_id` and is quadratic
    * only WITHIN a cluster — `k` scales with corpus size to hold
    * cluster population at the all-pairs budget (the paper runs
    * k≈10⁵ at web scale). `k` is a dial, not a guard: md5-rank seeds
    * carry no balance guarantee, so a dense embedding mode can
    * collapse most rows into one cluster regardless of `k`.
    * `maxClusterPop` is the guard — clusters whose population exceeds
    * it are EXCLUDED from the pair search (their members are reported
    * `kept = true`), the same broadcast-left-anti idiom as
    * [[lshCandidatePairs]]' hot-bucket cap: only the overfull cluster
    * ids are broadcast (tiny by construction — each holds > cap
    * rows). Documented recall loss, exact by default.
    *
    * `centroids`, when supplied (e.g. `IvfIndex.buildFrom` output),
    * replaces the md5-rank seed draw — balanced centroids keep
    * populations under the cap instead of tripping it.
    * Output: (idCol, cluster_id, kept).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int = 8, minCos: Double = 0.3,
                    maxClusterPop: Int = Int.MaxValue,
                    centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    import graft.functions.VectorFunctions
    val spark = df.sparkSession
    import spark.implicits._
    val seeds: Array[Array[Double]] = centroids.getOrElse(
      df.select(col(vecCol).as("v"),
          md5(concat(col(idCol).cast("string"), lit("|sem"))).as("__h"))
        .orderBy(col("__h").asc).limit(k)
        .select(col("v")).as[Array[Float]].collect()
        .map(_.map(_.toDouble)))
    val assigned = df.select(col(idCol), col(vecCol),
      VectorFunctions.nearestCentroid(col(vecCol), seeds).as("cluster_id"))
    val searched =
      if (maxClusterPop == Int.MaxValue) assigned
      else {
        val hot = assigned.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("__cn"))
          .filter(col("__cn") > maxClusterPop)
        assigned.join(broadcast(hot.select(col("cluster_id"))),
          Seq("cluster_id"), "left_anti")
      }
    val a = searched.select(col("cluster_id"), col(idCol).as("__aid"),
      col(vecCol).as("__avec"))
    val b = searched.select(col("cluster_id"), col(idCol).as("__bid"),
      col(vecCol).as("__bvec"))
    val drops = a.join(b, Seq("cluster_id"))
      .filter(col("__aid") < col("__bid") &&
        round(VectorFunctions.cosine(col("__avec"), col("__bvec")), 4) >= minCos)
      .select(col("__bid").as(idCol)).distinct()
    assigned.select(col(idCol), col("cluster_id"))
      .join(drops.withColumn("__dropped", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        coalesce(!col("__dropped"), lit(true)).as("kept"))
  }

  /** Positioned token n-gram table: (idCol, pos, nh) — one row per
    * 0-based token position, nh = the first 16 md5 hex chars of the
    * space-joined n-gram. The md5 slice (not xxhash64) keeps hash
    * semantics — including collisions — identical to the DuckDB
    * oracle; a production swap to xxhash64 changes one line. */
  def positionedNgrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(__w) - $n), i -> struct(i AS pos, " +
          s"substring(md5(concat_ws(' ', slice(__w, i + 1, $n))), 1, 16) AS nh))"))
        .as("g"))
      .select(col(idCol), col("g.pos").as("pos"), col("g.nh").as("nh"))
  }

  /** Cross-document EXACT substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): the
    * modality fuzzy dedup cannot express — a ≥ `minLen`-token span
    * shared verbatim by two documents, even when the documents are
    * otherwise unrelated (quotations, licence headers, syndicated
    * paragraphs). A shared L-token span is exactly a run of
    * L − n + 1 consecutive matching n-grams at a constant position
    * offset, so maximal spans fall out of a gaps-and-islands pass
    * over the matching n-gram pairs.
    *
    * Scale shape: ONE shuffle joins the positioned n-gram table to
    * itself on the 8-byte-equivalent hash — never on text — and the
    * `maxOccurrences` guard excludes corpus-common n-grams before the
    * join (broadcast left-anti, the LSH hot-bucket idiom), bounding
    * per-key fanout at cap². Corpus-common means boilerplate — the
    * documented pre-filter for boilerplate-heavy corpora is
    * [[Curation.dropBoilerplateLines]]; what the cap drops is recall on
    * spans every document shares, which exact-dedup pipelines prune
    * anyway. The island window partitions by (doc_a, doc_b, offset) —
    * pair-local, no global sort.
    *
    * Output: (doc_a, doc_b, start_a, start_b, len) per maximal shared
    * span, doc_a < doc_b, positions 0-based in tokens. */
  def exactSubstringSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 5, minLen: Int = 8,
                          maxOccurrences: Int = 50): DataFrame =
    spansFromNgrams(positionedNgrams(df, idCol, textCol, n), idCol,
      n, minLen, maxOccurrences)

  /** [[exactSubstringSpans]] over a prebuilt (ideally persisted)
    * [[positionedNgrams]] table — the shape multi-consumer pipelines
    * use: the n-gram table is the operator's one corpus-sized
    * intermediate and this plan reads it THREE times (hot-set count,
    * both self-join sides), so a caller sharing it across the span /
    * coverage / removal family caches it once (the
    * [[shingleTable]] lifecycle) instead of re-deriving it per read. */
  def spansFromNgrams(ng: DataFrame, idCol: String,
                      n: Int = 5, minLen: Int = 8,
                      maxOccurrences: Int = 50): DataFrame = {
    require(minLen >= n, s"minLen ($minLen) must be >= n ($n)")
    // The hot-n-gram guard engages BEFORE the nh shuffle it exists to
    // protect. A count window over nh would physically route every
    // occurrence of a hot n-gram to one reducer partition first and
    // only then drop it — the guard riding the very skew it guards
    // against. Instead the hot SET (count > cap) is derived with a
    // groupBy count, where map-side partial aggregation means reducers
    // see per-partition counts, never rows, and excluded with a
    // broadcast left-anti join, so hot occurrences die map-side with
    // no exchange at all. The hot set is tiny by construction (each
    // member exceeds the cap, so |hot| <= total n-grams / cap) — the
    // same bound that makes the LSH hot-bucket broadcast sound
    // ([[lshCandidatePairsIncremental]]). The extra scan of the
    // n-gram table is map-side-combined and cheap next to the join it
    // de-skews; callers sharing `ng` across passes should cache it
    // (the [[shingleTable]] lifecycle).
    val hot = ng.groupBy(col("nh")).agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxOccurrences)
      .select(col("nh"))
    val cool = ng.join(broadcast(hot), Seq("nh"), "left_anti")
    val a = cool.select(col("nh"), col(idCol).as("doc_a"), col("pos").as("pos_a"))
    val b = cool.select(col("nh"), col(idCol).as("doc_b"), col("pos").as("pos_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("__delta"))
      .orderBy(col("pos_a"))
    a.join(b, Seq("nh"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("__delta", col("pos_b") - col("pos_a"))
      .withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("__delta"), col("__isl"))
      .agg(min(col("pos_a")).as("__sa"), count(lit(1)).as("__c"))
      .filter(col("__c") + (n - 1) >= minLen)
      .select(col("doc_a"), col("doc_b"),
        col("__sa").cast("long").as("start_a"),
        (col("__sa") + col("__delta")).cast("long").as("start_b"),
        (col("__c") + (n - 1)).cast("long").as("len"))
  }

  /** Incremental exact-substring spans: maximal shared spans with at
    * least one NEW document — the batch-ingest shape of the span
    * family, completing the incremental symmetry the other dedup
    * modalities already have ([[exactIncrementalDups]],
    * [[lshCandidatePairsIncremental]], [[incrementalComponents]]).
    * A corpus deployment keeps its positioned-n-gram table current;
    * each arriving batch joins ITS n-grams against the table —
    * old–old pairs are never recomputed, so per-batch cost is
    * O(batch × n-gram-hit), not O(corpus²). The union of these spans
    * with the previous corpus's old-only spans IS the full span set
    * (spec-pinned — what makes incremental span bookkeeping sound).
    *
    * `isNew` marks batch rows (any predicate over the n-gram rows).
    * The hot-n-gram cap is computed over the FULL table — corpus
    * statistics, not batch statistics — and excluded pre-join exactly
    * as in [[spansFromNgrams]]. Each qualifying pair is generated
    * once: (new doc_a × any doc_b) covers pairs whose smaller id is
    * new; (old doc_a × new doc_b) covers the rest — disjoint by
    * construction. Output matches [[exactSubstringSpans]]. */
  def spansIncrementalFromNgrams(ng: DataFrame, idCol: String,
                                 isNew: Column, n: Int = 5,
                                 minLen: Int = 8,
                                 maxOccurrences: Int = 50): DataFrame = {
    require(minLen >= n, s"minLen ($minLen) must be >= n ($n)")
    val hot = ng.groupBy(col("nh")).agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxOccurrences)
      .select(col("nh"))
    val cool = ng.join(broadcast(hot), Seq("nh"), "left_anti")
      .withColumn("__new", isNew)
    def side(df: DataFrame, suffix: String) =
      df.select(col("nh"), col(idCol).as(s"doc_$suffix"),
        col("pos").as(s"pos_$suffix"))
    // Two disjoint joins, each with the (small) batch side as one
    // input, so old×old rows never materialize: (new a × any b)
    // covers pairs whose smaller id is new; (old a × new b) the rest.
    val m = side(cool.filter(col("__new")), "a")
        .join(side(cool, "b"), Seq("nh"))
        .filter(col("doc_a") < col("doc_b"))
      .unionAll(side(cool.filter(!col("__new")), "a")
        .join(side(cool.filter(col("__new")), "b"), Seq("nh"))
        .filter(col("doc_a") < col("doc_b")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("__delta"))
      .orderBy(col("pos_a"))
    m.withColumn("__delta", col("pos_b") - col("pos_a"))
      .withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("__delta"), col("__isl"))
      .agg(min(col("pos_a")).as("__sa"), count(lit(1)).as("__c"))
      .filter(col("__c") + (n - 1) >= minLen)
      .select(col("doc_a"), col("doc_b"),
        col("__sa").cast("long").as("start_a"),
        (col("__sa") + col("__delta")).cast("long").as("start_b"),
        (col("__c") + (n - 1)).cast("long").as("len"))
  }

  /** Per-document duplicated-SPAN coverage: the fraction of a
    * document's tokens lying inside at least one cross-document
    * shared span ([[exactSubstringSpans]] output) — the curation
    * signal that ranks "mostly syndicated" documents for removal,
    * where the pairwise span list only says WHO shares. Overlapping
    * spans count positions once (explode + distinct, not summed
    * lengths). Output: (idCol, n_tokens, dup_frac rounded 4), one row
    * per input document, 0.0 for span-free documents.
    *
    * Scale shape: span rows are the operator's bounded output (cap²
    * per n-gram), the position explode is bounded by span length, and
    * the per-doc distinct + count is one exchange keyed by the doc
    * id. */
  def spanCoverage(df: DataFrame, idCol: String, textCol: String,
                   spans: DataFrame): DataFrame = {
    val covered = spans
      .select(col("doc_a").as(idCol), col("start_a").as("__s"), col("len"))
      .union(spans
        .select(col("doc_b").as(idCol), col("start_b").as("__s"), col("len")))
      .select(col(idCol),
        explode(sequence(col("__s"), col("__s") + col("len") - 1)).as("__p"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("__ncov"))
    df.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        round(coalesce(col("__ncov"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 4).as("dup_frac"))
  }

  /** Exact-substring span REMOVAL — the output Lee et al. 2022
    * actually ship: the corpus rewritten with non-canonical span
    * occurrences cut. For every span row the doc_a occurrence is the
    * canonical copy (doc_a < doc_b always, so the globally smallest
    * sharing document keeps its text) and doc_b's tokens
    * [start_b, start_b + len) are deleted; a document hit by several
    * partners loses the UNION of its cut ranges (positions counted
    * once). Documents untouched by any span pass through verbatim; a
    * document wholly contained in another can come out empty (kept as
    * an empty-text row — downstream length gates drop it, matching
    * Lee et al.'s keep-then-filter shape).
    *
    * Scale shape: only documents that actually lose tokens are
    * re-assembled — a left-semi join restricts the posexplode +
    * anti-join + per-doc rebuild to the span-hit subset (bounded by
    * the span table, itself cap²-bounded per n-gram); the untouched
    * remainder of the corpus is never exploded or shuffled. The
    * rebuild is one exchange keyed by the doc id.
    *
    * Output: (idCol, text_clean, tokens_removed), one row per input
    * document. */
  /** Exact-substring spans AGAINST A REFERENCE SET — the span form of
    * benchmark decontamination (the GPT-3/PaLM appendix procedure:
    * training documents lose the verbatim spans they share with an
    * eval set, instead of being dropped whole the way [[contamination]]
    * flags them). Input is ONE positioned-n-gram table over
    * corpus ∪ reference ([[positionedNgrams]] — a deployment keeps it
    * current anyway, see [[spansIncrementalFromNgrams]]); `isRef`
    * marks reference rows. The join is reference × corpus only —
    * corpus×corpus pairs (the dedup problem, [[spansFromNgrams]]) and
    * reference×reference pairs never materialize, so per-batch cost is
    * O(reference n-gram hits), with the reference side typically tiny
    * (an eval suite) next to the corpus.
    *
    * The hot-n-gram cap stays a statistic of the FULL table — corpus-
    * common boilerplate is excluded pre-join exactly as in
    * [[spansFromNgrams]], with the same broadcast-left-anti shape.
    *
    * Output: (ref_id, doc_id, start_ref, start, len) per maximal
    * shared span, positions 0-based in tokens — feed it to
    * [[removeSpans]] (doc_b := doc_id) to cut the corpus side. */
  def spansAgainstReference(ng: DataFrame, idCol: String, isRef: Column,
                            n: Int = 5, minLen: Int = 8,
                            maxOccurrences: Int = 50): DataFrame = {
    require(minLen >= n, s"minLen ($minLen) must be >= n ($n)")
    val hot = ng.groupBy(col("nh")).agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxOccurrences)
      .select(col("nh"))
    val cool = ng.join(broadcast(hot), Seq("nh"), "left_anti")
      .withColumn("__ref", isRef)
    val a = cool.filter(col("__ref"))
      .select(col("nh"), col(idCol).as("ref_id"), col("pos").as("pos_a"))
    val b = cool.filter(!col("__ref"))
      .select(col("nh"), col(idCol).as("doc_id"), col("pos").as("pos_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ref_id"), col("doc_id"), col("__delta"))
      .orderBy(col("pos_a"))
    a.join(b, Seq("nh"))
      .withColumn("__delta", col("pos_b") - col("pos_a"))
      .withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy(col("ref_id"), col("doc_id"), col("__delta"), col("__isl"))
      .agg(min(col("pos_a")).as("__sa"), count(lit(1)).as("__c"))
      .filter(col("__c") + (n - 1) >= minLen)
      .select(col("ref_id"), col("doc_id"),
        col("__sa").cast("long").as("start_ref"),
        (col("__sa") + col("__delta")).cast("long").as("start"),
        (col("__c") + (n - 1)).cast("long").as("len"))
  }

  /** Longest repeated substring WITHIN each document, in tokens —
    * the model-generation-loop signal ([[duplicatedNgramFraction]]
    * measures how MUCH of a doc repeats; this measures the longest
    * single loop, which is what distinguishes a templated page from
    * a decoder stuck repeating a paragraph). Same islands algebra as
    * [[spansFromNgrams]], but the n-gram self-join is constrained to
    * the SAME document (pos_a < pos_b), so the join key is
    * (doc, nh) — per-document fanout only, and the per-doc hot cap
    * bounds a token repeated hundreds of times within one document
    * (the degenerate "aaaa…" doc) before the quadratic pairing.
    *
    * Output: (idCol, longest_repeat) — 0 for documents with no
    * ≥ n-token internal repeat. */
  def longestIntraRepeat(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 5, maxOccurrences: Int = 50): DataFrame = {
    val ng = positionedNgrams(df, idCol, textCol, n)
    val hot = ng.groupBy(col(idCol), col("nh"))
      .agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxOccurrences)
      .select(col(idCol), col("nh"))
    val cool = ng.join(broadcast(hot), Seq(idCol, "nh"), "left_anti")
    val m = cool.select(col(idCol), col("nh"), col("pos").as("pos_a"))
      .join(cool.select(col(idCol), col("nh"), col("pos").as("pos_b")),
        Seq(idCol, "nh"))
      .filter(col("pos_a") < col("pos_b"))
      .withColumn("__delta", col("pos_b") - col("pos_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("__delta")).orderBy(col("pos_a"))
    val per = m
      .withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy(col(idCol), col("__delta"), col("__isl"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c") + (n - 1)).cast("long").as("__lr"))
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__lr"), lit(0L)).as("longest_repeat"))
  }

  def removeSpans(df: DataFrame, idCol: String, textCol: String,
                  spans: DataFrame): DataFrame = {
    val cut = spans
      .select(col("doc_b").as(idCol),
        explode(sequence(col("start_b"),
          col("start_b") + col("len") - 1)).as("__p"))
      .distinct()
    val nRemoved = cut.groupBy(col(idCol))
      .agg(count(lit(1)).as("__nrem"))
    val rebuilt = df
      .join(cut.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__p", "__t")))
      .join(cut, Seq(idCol, "__p"), "left_anti")
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__p"), col("__t"))).as("__pt"))
      .select(col(idCol),
        array_join(transform(array_sort(col("__pt")), s => s("__t")), " ")
          .as("__clean"))
    df.select(col(idCol), col(textCol))
      .join(nRemoved, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__nrem").isNull, col(textCol))
          .otherwise(coalesce(col("__clean"), lit(""))).as("text_clean"),
        coalesce(col("__nrem"), lit(0L)).cast("long").as("tokens_removed"))
  }
}
