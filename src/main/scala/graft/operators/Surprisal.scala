package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.shingles

/** Bigram conditional surprisal with a frequency floor — the
  * perplexity proxy one step up from unigram surprisal, made safe for
  * web scale.
  *
  * Why the floor exists: unigram vocabulary saturates, but bigram
  * TYPES keep growing near-linearly with corpus size (Heaps' law) —
  * most of them singletons. Without a floor the per-bigram surprisal
  * table is not "vocabulary-sized ≪ corpus": it is corpus-sized, not
  * broadcastable, and the join back to the token stream becomes a full
  * string-key shuffle. With `minCount`, only bigrams seen at least
  * that often keep their conditional estimate −ln(c2/c1); the long
  * singleton tail BACKS OFF to the unigram surprisal of the second
  * word, −ln(c(w2)/N) — whose table is vocabulary-sized by
  * construction. The floored table shrinks toward the (saturating)
  * frequent-bigram set, restoring broadcastability.
  *
  * No extra corpus pass anywhere: the context counts c1(w1) = Σ c2,
  * the backoff counts c(w2) = Σ c2 over second positions, and the
  * normalizer N = Σ c2 all derive from the ONE bigram count table
  * (same derivation trick as the unigram q36 rework).
  *
  * `minCount = 1` reproduces the pure conditional form exactly.
  * Output: (doc_id, avg_bigram_surprisal round 4).
  */
object Surprisal {

  /** Intermediates, exposed for the scale spec: (bigram stream with
    * w2, floored conditional-surprisal table, backoff table). */
  private[graft] def bigramParts(doc: DataFrame, minCount: Long)
  : (DataFrame, DataFrame, DataFrame) = {
    val bg = doc
      .select(col("doc_id"), explode(shingles(col("text"), 2)).as("bg"))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val surp = c2.filter(col("c2") >= minCount).join(c1, Seq("w1"))
      .select(col("bg"), (-log(col("c2") / col("c1"))).as("surp"))
    val n = c2.agg(sum(col("c2")).cast("double").as("n"))
    val back = c2.groupBy(col("w2")).agg(sum(col("c2")).as("cw2"))
      .crossJoin(n) // 1-row normalizer
      .select(col("w2"), (-log(col("cw2") / col("n"))).as("bsurp"))
    (bg, surp, back)
  }

  /** Per-key token-distribution Shannon entropy (nats) — the corpus
    * health metric behind "did this source collapse into boilerplate"
    * and "is the mixture diverse enough": low entropy = a few tokens
    * dominate (template/spam), high = diffuse vocabulary. Computed as
    * H = ln N − (Σ c·ln c)/N, which needs ONE float pass over the
    * count table (no per-row p=c/N materialization).
    *
    * Scale shape: two key-grained aggs (the (key, token) count —
    * map-side combined — and the per-key fold); the totals table is
    * key-sized and joins back AQE-broadcast. Output: (keyCol, vocab,
    * n, entropy rounded 4). */
  def tokenEntropyPerKey(df: DataFrame, keyCol: String,
                         textCol: String): DataFrame = {
    val c = df.select(col(keyCol), explode(split(col(textCol), " ")).as("__t"))
      .groupBy(col(keyCol), col("__t")).agg(count(lit(1)).as("__c"))
    val n = c.groupBy(col(keyCol))
      .agg(sum(col("__c")).as("n"), count(lit(1)).as("vocab"))
    // n is #keys-sized; joining the vocab-sized count table on a
    // low-cardinality key by shuffle would funnel the corpus into
    // #keys partitions — broadcast the totals instead
    c.join(broadcast(n), Seq(keyCol))
      .groupBy(col(keyCol), col("n"), col("vocab"))
      .agg(sum(col("__c").cast("double") * log(col("__c").cast("double")))
        .as("__sclc"))
      .select(col(keyCol), col("vocab"), col("n"),
        (round(log(col("n").cast("double")) - col("__sclc") / col("n"), 4)
          + lit(0.0)).as("entropy"))
  }

  /** BOS-prefixed bigram stream: each document's words with "<s>"
    * prepended, emitted as (keep..., w1, w2) pairs — so the first real
    * word conditions on the document boundary, the LM convention. */
  private def bosBigrams(df: DataFrame, keep: Seq[String],
                         textCol: String): DataFrame =
    df.select(keep.map(col) :+
        split(concat(lit("<s> "), col(textCol)), " ").as("__w"): _*)
      .select(keep.map(col) ++ Seq(col("__w"),
        posexplode(col("__w")).as(Seq("__i", "w2"))): _*)
      .filter(col("__i") > 0 && length(col("w2")) > 0)
      .select(keep.map(col) ++
        Seq(element_at(col("__w"), col("__i")).as("w1"), col("w2")): _*)

  /** CCNet-style reference-LM quality scoring (Wenzek et al. 2020
    * shape): a bigram LM with add-one smoothing is trained on a
    * REFERENCE slice (the "clean" domain) and scores EVERY document
    * by mean surprisal under that model. Unlike [[bigramSurprisal]]
    * — the corpus scored against itself — this is cross-domain: the
    * model never sees the scored corpus, so boilerplate that
    * dominates the corpus but not the reference scores badly.
    *
    * Determinism discipline: per-token surprisals are quantized to
    * 1e-4 fixed point and summed as integers (the q172/q193 rule —
    * never avg(double) through the gate); the per-doc average is one
    * final division. Add-one smoothing is over the reference's w2
    * vocabulary plus one OOV slot, so unseen words AND unseen
    * contexts score finite, identically in both engines.
    *
    * Scale shape: the model is reference-sized (the clean slice's
    * bigram types — bounded by the slice, not the corpus); both model
    * joins are string-keyed shuffles AQE broadcasts when small; the
    * vocabulary normalizer is a broadcast one-row aggregate. Output:
    * (idCol, n_bigrams, avg_nlp round 4). */
  def refLmScore(docs: DataFrame, idCol: String, textCol: String,
                 ref: DataFrame, refTextCol: String): DataFrame = {
    val rb = bosBigrams(ref, Nil, refTextCol)
    val c2 = rb.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    val v = rb.agg((countDistinct(col("w2")) + 1L).as("__v"))
    bosBigrams(docs, Seq(idCol), textCol)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("__nlp", round(-log(
        (coalesce(col("__c2"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("__c1"), lit(0L)) + col("__v"))) * 10000, 0)
        .cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("__nlp")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__s") / 10000.0 / col("n_bigrams"), 4).as("avg_nlp"))
  }

  /** Zipf slope per source: the least-squares slope of ln(freq) vs
    * ln(rank) over each source's token frequency spectrum — the
    * one-number "does this source look like natural language"
    * diagnostic (natural text ≈ −1; templated/boilerplate sources
    * flatten, key-value noise steepens). Ranks are per-source windows
    * over the VOCABULARY (Heaps-sublinear in corpus size, so the
    * window partition stays far smaller than the token stream).
    *
    * Determinism discipline: each term's ln is quantized to 1e4 fixed
    * point FIRST, the regression sums run as exact integers (bounded:
    * |lnfp| ≤ 2e5, products ≤ 4e10, a 1e6-type vocabulary keeps sums
    * under 2^62), and only the final slope is computed in doubles
    * from those exact sums — float summation order can never move
    * the result. Output: (source, n_types, slope). */
  def zipfSlope(docs: DataFrame, sourceCol: String,
                textCol: String): DataFrame = {
    val tf = docs.select(col(sourceCol),
        explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col(sourceCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("__c").desc, col("__w"))
    tf.withColumn("__rk", row_number().over(w))
      .withColumn("__x", round(log(col("__rk").cast("double")) * 10000, 0)
        .cast("long"))
      .withColumn("__y", round(log(col("__c").cast("double")) * 10000, 0)
        .cast("long"))
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("source"), col("n_types"),
        // sums are exact longs; the final combination runs in DOUBLE
        // (n·Σxy etc. overflow 64 bits at large vocabularies) — a
        // fixed sequence of 6 float ops, identical in both engines
        round((col("n_types").cast("double") * col("__sxy").cast("double")
            - col("__sx").cast("double") * col("__sy").cast("double")) /
          (col("n_types").cast("double") * col("__sxx").cast("double")
            - col("__sx").cast("double") * col("__sx").cast("double")),
          4).as("slope"))
  }

  /** The S×S cross-domain affinity matrix: every source's corpus
    * scored by mean bigram surprisal under every OTHER source's
    * add-one-smoothed bigram LM (diagonal = self-affinity, the
    * natural floor). The artifact that grounds mixture design:
    * "which domains predict which" picks transfer-friendly pairs,
    * and a row whose off-diagonal entries all blow up is an island.
    * Same smoothing, fixed-point, and vocabulary conventions as
    * [[refLmScore]] — one model per source instead of one.
    *
    * Scale shape: eval bigrams AGGREGATE to per-(source, bigram)
    * counts before scoring (surprisal is linear in counts), so the
    * scored table is bounded by S × bigram types, not token count;
    * the S-fold candidate blowup (each eval bigram meets every
    * train LM) is the honest cost of an S×S matrix and shuffles on
    * (train, w1, w2). Output: (src_train, src_eval, n_bigrams,
    * avg_nlp). */
  def domainAffinity(docs: DataFrame, sourceCol: String, textCol: String,
                     keepSources: Seq[String]): DataFrame = {
    val b = bosBigrams(
      docs.filter(col(sourceCol).isin(keepSources: _*)),
      Seq(sourceCol), textCol)
    val c2 = b.groupBy(col(sourceCol).as("src_train"), col("w1"),
        col("w2"))
      .agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(col("src_train"), col("w1"))
      .agg(sum(col("__c2")).as("__c1"))
    val v = b.groupBy(col(sourceCol).as("src_train"))
      .agg((countDistinct(col("w2")) + 1L).as("__v"))
    val ev = b.groupBy(col(sourceCol).as("src_eval"), col("w1"),
        col("w2"))
      .agg(count(lit(1)).as("__ce"))
    ev.crossJoin(broadcast(v.select(col("src_train"))))
      .join(c2, Seq("src_train", "w1", "w2"), "left")
      .join(c1, Seq("src_train", "w1"), "left")
      .join(broadcast(v), Seq("src_train"))
      .withColumn("__nlp", round(-log(
        (coalesce(col("__c2"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("__c1"), lit(0L)) + col("__v"))) * 10000, 0)
        .cast("long"))
      .groupBy(col("src_train"), col("src_eval"))
      .agg(sum(col("__ce")).cast("long").as("n_bigrams"),
        sum(col("__ce") * col("__nlp")).as("__s"))
      .select(col("src_train"), col("src_eval"), col("n_bigrams"),
        round(col("__s") / 10000.0 / col("n_bigrams"), 4).as("avg_nlp"))
  }

  /** [[refLmScore]] partitioned into the CCNet head/middle/tail
    * terciles by corpus rank of (avg_nlp, id) — the buckets a
    * pipeline samples from at different rates. Rank is the
    * distributed two-phase prefix sum ([[Packing.stableIds]]), never
    * a global sort; the sparse composite rank key is exactly the
    * shape stableIds' sampled range-bucketing fallback exists for.
    * Output: scored columns + bucket. */
  def refLmBuckets(scored: DataFrame, idCol: String): DataFrame = {
    // the rank key's lineage is the whole reference-LM scoring
    // pipeline — materialize it ONCE (docs-sized, narrow) so the
    // ranking's bounds/histogram/window passes don't re-run it; rank
    // attached in place (same row_id per key)
    val keyed = scored.withColumn("__key",
        round(col("avg_nlp") * 10000, 0).cast("long") * (1L << 40) +
          col(idCol))
      .localCheckpoint(true)
    val n = keyed.agg(count(lit(1)).as("__n"))
    Packing.withStableIds(keyed, "__key")
      .crossJoin(broadcast(n))
      .withColumn("__t", expr("(row_id * 3) div __n")) // integer div —
      // Spark's `/` is double division even on longs
      .select(col(idCol), col("n_bigrams"), col("avg_nlp"),
        when(col("__t") === 0, "head")
          .when(col("__t") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DoReMi-flavored domain reweighting (Xie et al. 2023 shape) on
    * top of [[refLmScore]]: domains whose documents the reference
    * model finds HARD (mean surprisal above the corpus mean) get
    * upweighted in proportion to their excess — the "spend training
    * on what the model hasn't absorbed" signal, computed from the
    * proxy scores instead of a proxy-model training run. Domains at
    * or below the corpus mean get weight 0 (they are already well
    * covered by the reference).
    *
    * All means are 1e-4 fixed-point integer sums divided once; the
    * weight is one rational `excess / Σexcess` rounded 4 — nothing
    * cross-engine-fragile. Output: (sourceCol, n_docs, mean_nlp,
    * excess, weight), weight summing to ~1 across upweighted domains
    * (all-zero excess → all weights 0, surfaced not hidden).
    *
    * Scale shape: one source-grained agg over the scored table plus a
    * broadcast one-row corpus aggregate — #sources output rows. */
  def domainReweight(scored: DataFrame, sourceCol: String): DataFrame = {
    val fixed = scored.withColumn("__f",
      round(col("avg_nlp") * 10000, 0).cast("long"))
    val per = fixed.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("__f")).as("__sf"))
      .withColumn("__mean", expr("__sf div n_docs")) // fixed-point mean
    val glob = fixed.agg(expr("sum(__f) div count(1)").as("__gmean"))
    val ex = per.crossJoin(broadcast(glob))
      .withColumn("excess",
        greatest(col("__mean") - col("__gmean"), lit(0L)))
    val tot = ex.agg(sum(col("excess")).as("__tot"))
    ex.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"),
        round(col("__mean") / 10000.0, 4).as("mean_nlp"),
        round(col("excess") / 10000.0, 4).as("excess"),
        when(col("__tot") > 0,
          round(col("excess").cast("double") / col("__tot"), 4))
          .otherwise(lit(0.0)).as("weight"))
  }

  /** Per-document average bigram surprisal with backoff below the
    * floor. Two joins back to the bigram stream, both against tables
    * that are frequent-bigram- resp. vocabulary-sized (AQE broadcasts
    * them when small). */
  def bigramSurprisal(doc: DataFrame, minCount: Long = 1L): DataFrame = {
    val (bg, surp, back) = bigramParts(doc, minCount)
    bg.join(surp, Seq("bg"), "left")
      .join(back, Seq("w2"))
      .groupBy(col("doc_id"))
      .agg(round(avg(coalesce(col("surp"), col("bsurp"))), 4)
        .as("avg_bigram_surprisal"))
  }
}
