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
