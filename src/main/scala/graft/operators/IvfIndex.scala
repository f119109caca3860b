package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate-nearest-neighbor index: the
  * coarse-quantizer scale path for similarity search (SURVEY/brief:
  * "an IVF or LSH-bucketed variant as the scale path").
  *
  * Build: k centroids trained by a few deterministic Lloyd
  * iterations (init = hash-stratified seeding, [[seedStratified]] —
  * reproducible without a seed, spread across the corpus even when
  * ids correlate with content), then every vector is assigned to its
  * nearest centroid's list. The corpus is thereby partitioned into k
  * lists — at 100 TB, lists are the shuffle/bucketing key and a probe
  * touches `nprobe/k` of the data instead of all of it.
  *
  * Query: rank centroids per query (a k-row broadcast cross join),
  * keep the `nprobe` nearest, and brute-force cosine ONLY within the
  * probed lists. `nprobe = k` degrades gracefully to exact brute
  * force (every list probed) — the correctness anchor the spec pins.
  */
object IvfIndex {

  /** Centroid-assigned corpus: input columns + `list_id`. Centroids
    * come back as a small driver-side array (k × dim — the index
    * metadata a real deployment persists beside the data; see
    * [[save]]/[[load]]). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 3): (Array[Array[Double]], DataFrame) = {
    var centroids = seedStratified(corpus, idCol, vecCol, k)
    for (_ <- 0 until iters)
      centroids = step(corpus, vecCol, centroids)
    (centroids, assign(corpus, vecCol, centroids))
  }

  /** Deterministic, id-order-independent seeding: each row hashes into
    * one of k strata (`xxhash64(id) mod k`), and the stratum's seed is
    * the vector with the minimum hash — a reproducible pseudo-random
    * sample SPREAD ACROSS the corpus, without a seed, a collect beyond
    * k×dim, or an extra corpus pass (one map-side-combined `min_by`
    * aggregation to k rows).
    *
    * The first-k-by-id init this replaces was degenerate whenever ids
    * correlate with content (ingest order, source grouping): all k
    * seeds landed in one cluster, and at 100 TB every Lloyd iteration
    * spent recovering from it is a full corpus pass
    * ([[graft.ScaleOpsSpec]] ("IVF seeding" case) pins the failure case and the recall win).
    * Corpora smaller than ~k (some strata empty) top up from the
    * lowest-hash rows overall, so `build` always gets k seeds when the
    * corpus has k distinct rows. */
  private[graft] def seedStratified(corpus: DataFrame, idCol: String,
                                        vecCol: String, k: Int): Array[Array[Double]] = {
    val hashed = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__h", xxhash64(col("__id")))
    val seeds = hashed
      .withColumn("__stratum", pmod(col("__h"), lit(k.toLong)))
      .groupBy(col("__stratum"))
      .agg(min_by(col("__v"), struct(col("__h"), col("__id"))).as("__v"))
      .select(col("__v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (seeds.length >= k) seeds
    else { // tiny corpus: top up deterministically from the global hash order
      val extra = hashed.orderBy(col("__h"), col("__id"))
        .limit(k).select(col("__v")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        .filterNot(v => seeds.exists(_.sameElements(v)))
      seeds ++ extra.take(k - seeds.length)
    }
  }

  /** The legacy first-k-by-id init, kept package-private as the
    * degenerate baseline [[graft.ScaleOpsSpec]] ("IVF seeding" case) measures against. */
  private[graft] def seedFirstK(corpus: DataFrame, idCol: String,
                                    vecCol: String, k: Int): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** [[build]] with caller-chosen seeds (for the seeding comparison
    * spec and for resuming from persisted centroids). */
  private[graft] def buildFrom(corpus: DataFrame, vecCol: String,
                                   seeds: Array[Array[Double]],
                                   iters: Int): (Array[Array[Double]], DataFrame) = {
    var centroids = seeds
    for (_ <- 0 until iters)
      centroids = step(corpus, vecCol, centroids)
    (centroids, assign(corpus, vecCol, centroids))
  }

  /** One Lloyd iteration: assign, then per-list per-dimension mean.
    * Empty lists keep their previous centroid. The only exchange is
    * the (list_id, pos) mean aggregation — genuinely required, and
    * map-side combined down to k×dim rows. */
  private def step(corpus: DataFrame, vecCol: String,
                   centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val assigned = assign(corpus, vecCol, centroids)
    val means = assigned
      .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("list_id"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("list_id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
        .as("centroid"))
      .collect()
      .map(r => r.getAs[Long]("list_id").toInt -> r.getSeq[Double](1).toArray)
      .toMap
    centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
  }

  /** Nearest-centroid assignment as a PURE PROJECTION: the native
    * [[graft.functions.NearestCentroid]] expression carries the k×dim
    * matrix into codegen, so the corpus is mapped in place — no join,
    * no window, no exchange. (The previous crossJoin + per-row-id
    * window argmin hash-shuffled k×|corpus| rows per call — at 100 TB
    * that was ~8 corpus-volumes through the exchange per Lloyd pass.) */
  private def assign(corpus: DataFrame, vecCol: String,
                     centroids: Array[Array[Double]]): DataFrame =
    corpus.withColumn("list_id", nearestCentroid(col(vecCol), centroids))

  /** Cosine where one side is already array<double>. */
  private def cosineD(a: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) = {
    val dotDC = aggregate(zip_with(a, c, (x, y) => x.cast("double") * y), lit(0.0), (s, v) => s + v)
    val nC = sqrt(aggregate(transform(c, x => x * x), lit(0.0), (s, v) => s + v))
    dotDC / (norm2(a) * nC)
  }

  /** Top-k neighbors per query, searching only the `nprobe` lists
    * whose centroids are nearest each query vector. Output:
    * (q_id, n_id, cos, rk) — the brute-force schema, so results are
    * directly comparable (and identical when nprobe = k).
    *
    * `broadcastProbes` picks the probe-join distribution:
    *  - `true` (default): the (queries × nprobe)-row probe table is
    *    BROADCAST — the corpus side never moves at all. Right until
    *    the query batch itself is huge.
    *  - `false`: sort-merge on `list_id`. When `indexed` is the
    *    BUCKETED lists table of a [[save]]d index, its scan already
    *    reports `HashPartitioning(list_id, buckets)`, so the corpus
    *    side STILL never moves — only the small probe side shuffles
    *    into the bucket layout (spec-pinned: exactly one exchange on
    *    the join, none over the lists scan). The big-query-batch
    *    scale path. */
  def topK(indexed: DataFrame, centroids: Array[Array[Double]],
           queries: DataFrame, idCol: String, vecCol: String,
           k: Int, nprobe: Int, broadcastProbes: Boolean = true): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val cDf = centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("list_id", "c_vec")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // probe selection: nprobe nearest centroids per query (k rows each)
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("__d").desc, col("list_id").asc)
    val probes = q.crossJoin(broadcast(cDf))
      .withColumn("__d", cosineD(col("q_vec"), col("c_vec")))
      .withColumn("__rk", row_number().over(wProbe))
      .filter(col("__rk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("list_id"))
    // search only the probed lists: join on list_id, then take top-k
    // via partition-local heaps — each vector lives in exactly ONE
    // list and probes are distinct per (q, list), so (q_id, n_id) is
    // already unique and only |partitions|×|queries|×k candidates
    // reach the rank exchange (not every probed-candidate row)
    val cand = indexed.select(col("list_id"),
      col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val probeSide =
      if (broadcastProbes) broadcast(probes) else probes.hint("merge")
    val scored = probeSide.join(cand, Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 4).as("cos"))
    Similarity.topKPerKey(scored, k)
  }

  /** FILTERED vector search — [[topK]] with a per-query metadata
    * constraint: each query row carries a target label and only
    * candidates whose `labelCol` matches may enter its top-k (the
    * "search within my tenant / language / shard" shape every vector
    * store grows). The constraint is applied PRE-ranking, during the
    * probed-list scan — a post-filter over an unconstrained top-k
    * would return `< k` rows and lose recall whenever the filter is
    * selective, the classic filtered-ANN failure mode. Cost shape is
    * exactly [[topK]]'s (the label equality rides the same probe
    * join; non-matching candidates die before scoring a cosine), so
    * selective filters make the query CHEAPER, not weaker.
    * Queries: (idCol, vecCol, labelCol = target). Output:
    * (q_id, n_id, cos, rk). */
  def topKFiltered(indexed: DataFrame, centroids: Array[Array[Double]],
                   queries: DataFrame, idCol: String, vecCol: String,
                   labelCol: String, k: Int, nprobe: Int): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val cDf = centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("list_id", "c_vec")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("__qlab"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("__d").desc, col("list_id").asc)
    val probes = q.crossJoin(broadcast(cDf))
      .withColumn("__d", cosineD(col("q_vec"), col("c_vec")))
      .withColumn("__rk", row_number().over(wProbe))
      .filter(col("__rk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("__qlab"), col("list_id"))
    val cand = indexed.select(col("list_id"),
      col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col(labelCol).as("__nlab"))
    val scored = broadcast(probes).join(cand, Seq("list_id"))
      .filter(col("q_id") =!= col("n_id") && col("__nlab") === col("__qlab"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 4).as("cos"))
    Similarity.topKPerKey(scored, k)
  }

  /** Persist the index beside the data: centroids as a tiny managed
    * parquet table, assigned lists as a table BUCKETED on `list_id`
    * (so a reloaded index scans and joins per-list with zero
    * exchanges — the probe join's distribution is pinned at write
    * time). The build is the expensive step; a deployment builds
    * once, saves, and every consumer [[load]]s.
    *
    * The artifact CARRIES ITS DERIVATION (the reference's provenance
    * ethos, util.py:83-93): `provenance` plus k/dim land in the
    * centroid column's StructField metadata, which Spark embeds in the
    * parquet footer and restores on read — no side table, no sidecar. */
  def save(spark: SparkSession, name: String,
           centroids: Array[Array[Double]], indexed: DataFrame,
           buckets: Int = 8,
           provenance: Map[String, String] = Map.empty): Unit = {
    saveCentroids(spark, name, centroids, buckets, provenance)
    Bucketing.writeBucketed(indexed, s"${name}_lists", "list_id", buckets)
  }

  /** The centroid half of [[save]] (also reused by [[rebuild]], which
    * swaps the lists table separately via stage-and-rename). */
  private def saveCentroids(spark: SparkSession, name: String,
                            centroids: Array[Array[Double]], buckets: Int,
                            provenance: Map[String, String]): Unit = {
    import spark.implicits._
    import graft.functions.{JStr, JVal}
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.ivf.provenance",
        JVal.obj(provenance.toSeq.sortBy(_._1)
          .map { case (k, v) => k -> (JStr(v): JVal) }: _*).render)
      .putLong("graft.ivf.k", centroids.length.toLong)
      .putLong("graft.ivf.dim",
        centroids.headOption.map(_.length).getOrElse(0).toLong)
      .putLong("graft.ivf.buckets", buckets.toLong)
      .build()
    val cDf = centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq.toDF("list_id", "c_vec")
      .select(col("list_id"), col("c_vec").as("c_vec", meta))
    Bucketing.dropManagedTable(spark, s"${name}_centroids")
    cDf.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${name}_centroids")
  }

  /** Fold a batch of NEW vectors into a [[save]]d index without a
    * rebuild — the ANN half of the incremental-ingest story (the text
    * half is [[Dedup.lshCandidatePairsIncremental]] +
    * [[Dedup.incrementalComponents]]). The batch is assigned with the
    * SAVED centroids through the native nearest-centroid projection
    * (no join, no exchange, no Lloyd pass — the existing corpus is
    * never touched), and the rows append under the lists table's OWN
    * bucket spec (count restored from the index metadata), so the
    * writer routes them into the existing per-list buckets and a
    * subsequent [[topKSaved]] probe still scans the corpus side with
    * zero exchanges (spec-pinned after an append).
    *
    * Exactness at nprobe = k is unaffected — every list is still
    * probed. At nprobe < k, recall degrades only as the ingested
    * distribution drifts from the centroid training slice; the
    * re-train cadence is the deployment knob every IVF system
    * carries, and [[provenance]] records what the centroids were
    * trained on so the drift is auditable. */
  def appendSaved(spark: SparkSession, name: String, batch: DataFrame,
                  idCol: String, vecCol: String): Unit = {
    val meta = spark.table(s"${name}_centroids").schema("c_vec").metadata
    require(meta.contains("graft.ivf.buckets"),
      s"index '$name' predates bucket-count metadata; re-save it before appending")
    val buckets = meta.getLong("graft.ivf.buckets").toInt
    val centroids = load(spark, name)._1
    // the batch must carry the same payload columns the index was
    // built with (it is the same corpus, one batch later); align to
    // the table's column order for the positional parquet append
    val cols = spark.table(s"${name}_lists").columns
    assign(batch, vecCol, centroids)
      .select(cols.map(col).toIndexedSeq: _*)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, "list_id")
      .sortBy("list_id")
      .format("parquet")
      .saveAsTable(s"${name}_lists")
  }

  /** Per-list drift signal of a [[save]]d index: cosine between each
    * saved centroid and the CURRENT mean of the vectors assigned to
    * its list — the index-level twin of the label-level monitor
    * (q117). After [[appendSaved]] batches accumulate, a list whose
    * population has moved away from the centroid that routes probes
    * to it reads drift < 1; the re-train cadence every IVF deployment
    * carries becomes a measurable trigger ([[rebuildIfDrifted]])
    * instead of a calendar guess.
    *
    * Cost shape: one map-side-combined (list_id, pos) mean over the
    * bucketed lists table (no join reaches the corpus — the k×dim
    * saved centroids attach to the k-row result). Lists that lost
    * every vector are absent (nothing to compare). Output:
    * (list_id, n_vecs, drift rounded 4). */
  def indexDrift(spark: SparkSession, name: String,
                 vecCol: String): DataFrame = {
    import spark.implicits._
    val (centroids, lists) = load(spark, name)
    val cDf = centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("list_id", "__c_saved")
    val cur = lists
      .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("list_id"), col("pos"))
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(col("list_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("__c_cur"))
    val n = lists.groupBy(col("list_id")).agg(count(lit(1)).as("n_vecs"))
    cur.join(n, Seq("list_id")).join(broadcast(cDf), Seq("list_id"))
      .select(col("list_id"), col("n_vecs"),
        round(cosine(col("__c_saved"), col("__c_cur")), 4).as("drift"))
  }

  /** Re-train a [[save]]d index in place: Lloyd iterations over the
    * CURRENT lists table seeded from the SAVED centroids (warm start —
    * the drifted centroids are still the best available description
    * of the data), then re-assign every vector and swap the new lists
    * table in. The act on [[indexDrift]]'s monitor.
    *
    * The new lists are written to a STAGING table and renamed over
    * the old one — an overwrite would delete the very files the
    * re-assignment plan is still reading, and at 100 TB the
    * stage-and-swap is also what keeps the index readable until the
    * rebuild commits. Bucketing (and therefore the zero-exchange
    * probe property) survives the rename; the centroid table records
    * the rebuild in its provenance. */
  def rebuild(spark: SparkSession, name: String, vecCol: String,
              iters: Int = 3): Unit = {
    val meta = spark.table(s"${name}_centroids").schema("c_vec").metadata
    val buckets =
      if (meta.contains("graft.ivf.buckets")) meta.getLong("graft.ivf.buckets").toInt
      else 8
    val prev = provenance(spark, name)
    val (centroids, lists) = load(spark, name)
    val (c2, assigned) = buildFrom(lists.drop("list_id"), vecCol, centroids, iters)
    val stage = s"${name}_lists_stage"
    Bucketing.dropManagedTable(spark, stage)
    Bucketing.writeBucketed(assigned, stage, "list_id", buckets)
    Bucketing.dropManagedTable(spark, s"${name}_lists")
    spark.sql(s"ALTER TABLE $stage RENAME TO ${name}_lists")
    saveCentroids(spark, name, c2, buckets,
      Map("rebuilt" -> s"lloyd iters=$iters") ++
        prev.get("provenance").map("prev" -> _))
  }

  /** [[rebuild]] gated on the [[indexDrift]] monitor: retrain only
    * when some list's drift fell below `minCos`. Returns whether the
    * rebuild ran — below the threshold the saved tables are untouched
    * (spec-pinned), so a deployment can call this after every append
    * batch and pay the rebuild only when the index has actually
    * decayed. */
  def rebuildIfDrifted(spark: SparkSession, name: String, vecCol: String,
                       minCos: Double, iters: Int = 3): Boolean = {
    val worst = indexDrift(spark, name, vecCol)
      .agg(min(col("drift"))).head()
    val triggered = !worst.isNullAt(0) && worst.getDouble(0) < minCos
    if (triggered) rebuild(spark, name, vecCol, iters)
    triggered
  }

  /** Provenance of a [[save]]d index, from the centroid column's
    * restored StructField metadata: the raw JSON string under
    * "provenance" plus "k"/"dim". */
  def provenance(spark: SparkSession, name: String): Map[String, String] = {
    val m = spark.table(s"${name}_centroids").schema("c_vec").metadata
    Seq("provenance" -> "graft.ivf.provenance").collect {
      case (k, key) if m.contains(key) => k -> m.getString(key)
    }.toMap ++
      Seq("k" -> "graft.ivf.k", "dim" -> "graft.ivf.dim").collect {
        case (k, key) if m.contains(key) => k -> m.getLong(key).toString
      }
  }

  /** Reload a [[save]]d index: (centroids, assigned lists). */
  def load(spark: SparkSession, name: String): (Array[Array[Double]], DataFrame) = {
    val centroids = spark.table(s"${name}_centroids")
      .orderBy(col("list_id")).collect()
      .map(_.getSeq[Double](1).toArray)
    (centroids, spark.table(s"${name}_lists"))
  }

  /** TWO-LEVEL (hierarchical) IVF build — the >10⁹-vector scale path:
    * a flat IVF needs ~√N lists and every query scores every
    * centroid; two levels (k1 coarse cells × k2 fine cells each) give
    * k1·k2 effective lists while a query scores only
    * k1 + nprobe1·k2 centroids.
    *
    * Coarse = the flat [[build]] (or caller seeds, e.g. label means,
    * with `coarseIters = 0` — the q198 construction). Fine seeds =
    * each cell's k2 lowest-md5 member VECTORS (the [[seedStratified]]
    * determinism idiom: reproducible, id-order independent, no Lloyd
    * pass — at this depth the cells are already tight). Fine
    * assignment is a PURE PROJECTION: the k1×k2×dim seed table is a
    * driver-bounded artifact (exactly like the flat centroid matrix),
    * embedded as a map literal and argmax'd per row with codegen'd
    * higher-order functions — the corpus never shuffles during
    * assignment (the window-argmin alternative would exchange
    * corpus×k2 rows). Ties break to the lowest fine_id on exact
    * double equality, matching the q198 oracle's window order.
    *
    * Returns (coarse centroids, fineSeeds (list_id, fine_id, f_vec),
    * lists = corpus columns + list_id + fine_id). */
  def buildTwoLevel(corpus: DataFrame, idCol: String, vecCol: String,
                    k1: Int, k2: Int, coarseIters: Int = 3,
                    coarseSeeds: Option[Array[Array[Double]]] = None)
      : (Array[Array[Double]], DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (c0, coarse) = coarseSeeds match {
      case Some(s) => buildFrom(corpus, vecCol, s, coarseIters)
      case None    => build(corpus, idCol, vecCol, k1, coarseIters)
    }
    val wSeed = Window.partitionBy(col("list_id"))
      .orderBy(md5(concat(col(idCol).cast("string"), lit("|ivf2"))).asc,
        col(idCol).asc)
    val fineSeeds = coarse.withColumn("__rk", row_number().over(wSeed))
      .filter(col("__rk") <= k2)
      .select(col("list_id"), (col("__rk") - 1).cast("long").as("fine_id"),
        col(vecCol).cast("array<double>").as("f_vec"))
      .localCheckpoint(true) // k1×k2 rows — a driver-bounded artifact
    val cellSeeds: Map[Long, Seq[Seq[Double]]] = fineSeeds
      .orderBy(col("list_id"), col("fine_id")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getSeq[Double](2)).toSeq)
      .toMap
    val cands = element_at(typedLit(cellSeeds), col("list_id"))
    val scored = transform(cands, (s, i) =>
      struct(cosine(col(vecCol).cast("array<double>"), s).as("c"),
        i.cast("long").as("i")))
    val best = aggregate(scored,
      struct(lit(Double.NegativeInfinity).as("c"), lit(0L).as("i")),
      (acc, x) => when(x.getField("c") > acc.getField("c"), x).otherwise(acc))
    (c0, fineSeeds, coarse.withColumn("fine_id", best.getField("i")))
  }

  /** Top-k probe of a [[buildTwoLevel]] index: rank coarse cells per
    * query (k1-row broadcast cross join), keep `nprobe1`; rank each
    * probed cell's fine seeds (broadcast join), keep `nprobe2`; brute
    * cosine ONLY within the probed (list, fine) lists. Probes
    * broadcast, so the corpus side never moves — the [[topK]]
    * exchange discipline. `nprobe1 = k1, nprobe2 = k2` degrades
    * gracefully to exact brute force (spec-pinned). Output:
    * (q_id, n_id, cos, rk) — the flat-probe schema. */
  def topK2(lists: DataFrame, coarse: Array[Array[Double]],
            fineSeeds: DataFrame, queries: DataFrame,
            idCol: String, vecCol: String,
            k: Int, nprobe1: Int, nprobe2: Int,
            broadcastProbes: Boolean = true): DataFrame = {
    val spark = lists.sparkSession
    import spark.implicits._
    val cDf = coarse.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("list_id", "c_vec")
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val wp1 = Window.partitionBy(col("q_id"))
      .orderBy(col("__d").desc, col("list_id").asc)
    val probeC = q.crossJoin(broadcast(cDf))
      .withColumn("__d", cosine(col("q_vec"), col("c_vec")))
      .withColumn("__k1", row_number().over(wp1))
      .filter(col("__k1") <= nprobe1)
      .select(col("q_id"), col("q_vec"), col("list_id"))
    val wp2 = Window.partitionBy(col("q_id"), col("list_id"))
      .orderBy(col("__d2").desc, col("fine_id").asc)
    val probeF = probeC.join(broadcast(fineSeeds), Seq("list_id"))
      .withColumn("__d2", cosine(col("q_vec"), col("f_vec")))
      .withColumn("__k2", row_number().over(wp2))
      .filter(col("__k2") <= nprobe2)
      .select(col("q_id"), col("q_vec"), col("list_id"), col("fine_id"))
    val probeSide =
      if (broadcastProbes) broadcast(probeF) else probeF.hint("merge")
    val scored = probeSide
      .join(lists.select(col("list_id"), col("fine_id"),
        col(idCol).as("n_id"), col(vecCol).as("n_vec")),
        Seq("list_id", "fine_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec").cast("array<double>")), 4)
          .as("cos"))
    Similarity.topKPerKey(scored, k)
  }

  /** Persist a [[buildTwoLevel]] index beside the data: centroids and
    * fine seeds as tiny managed tables, lists BUCKETED on the
    * composite (list_id, fine_id) — a reloaded probe joins the corpus
    * side with zero exchanges in merge mode, the [[save]] contract on
    * the deeper hierarchy. */
  def saveTwoLevel(spark: SparkSession, name: String,
                   coarse: Array[Array[Double]], fineSeeds: DataFrame,
                   lists: DataFrame, buckets: Int = 8,
                   provenance: Map[String, String] = Map.empty): Unit = {
    saveCentroids(spark, name, coarse, buckets, provenance)
    Bucketing.dropManagedTable(spark, s"${name}_fineseeds")
    fineSeeds.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${name}_fineseeds")
    Bucketing.writeBucketedMulti(lists, s"${name}_lists2",
      Seq("list_id", "fine_id"), buckets)
  }

  /** Reload a [[saveTwoLevel]] index: (coarse, fineSeeds, lists). */
  def loadTwoLevel(spark: SparkSession, name: String)
      : (Array[Array[Double]], DataFrame, DataFrame) = {
    val coarse = spark.table(s"${name}_centroids")
      .orderBy(col("list_id")).collect()
      .map(_.getSeq[Double](1).toArray)
    (coarse, spark.table(s"${name}_fineseeds"),
      spark.table(s"${name}_lists2"))
  }

  /** Probe a [[saveTwoLevel]] index by name — the deployment entry
    * point for the hierarchical path. */
  def topK2Saved(spark: SparkSession, name: String, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 nprobe1: Int, nprobe2: Int,
                 broadcastProbes: Boolean = true): DataFrame = {
    val (coarse, fineSeeds, lists) = loadTwoLevel(spark, name)
    topK2(lists, coarse, fineSeeds, queries, idCol, vecCol, k,
      nprobe1, nprobe2, broadcastProbes)
  }

  /** Probe a [[save]]d index by name — the deployment entry point.
    * Routes through the bucketed lists table so the corpus side joins
    * with zero exchanges in either probe mode (see [[topK]]). */
  def topKSaved(spark: SparkSession, name: String, queries: DataFrame,
                idCol: String, vecCol: String, k: Int, nprobe: Int,
                broadcastProbes: Boolean = true): DataFrame = {
    val (centroids, lists) = load(spark, name)
    topK(lists, centroids, queries, idCol, vecCol, k, nprobe, broadcastProbes)
  }
}
