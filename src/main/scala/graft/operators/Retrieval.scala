package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the keyword-search complement
  * to the embedding operators ([[Similarity]], [[IvfIndex]], [[Pq]]):
  * BM25-ranked top-k documents per query (Robertson/Zaragoza's
  * Okapi BM25, the Lucene-default scoring function).
  *
  * Scale shape — filter FIRST, weigh later: the corpus tokenizes to
  * per-(doc, term) postings once, the (small) query-term set
  * broadcasts into the postings scan, and every downstream step —
  * document frequency, length normalization, scoring, ranking — runs
  * over the FILTERED postings only, never the full vocabulary:
  *  - df per term = a count window over the filtered postings
  *    partitioned by term (df of a term is the same number whether
  *    counted over all postings or just that term's — so the
  *    vocabulary-wide frequency table is never built);
  *  - corpus size and average doc length are one scalar aggregate,
  *    broadcast via crossJoin;
  *  - ranking reuses [[Similarity.topKPerKey]]'s partition-local
  *    heaps — scores are rounded before ranking so ties are
  *    deterministic (score desc, doc asc).
  */
object Retrieval {

  /** BM25 top-k: queries (qIdCol, qTextCol — whitespace terms,
    * duplicates ignored) against documents (idCol, textCol).
    * Output: (q_id, doc_id, score, rk), score rounded to 4, rk by
    * (score desc, doc_id asc). Documents matching no query term are
    * absent; a query matching nothing yields no rows. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25FromPostings(buildPostings(df, idCol, textCol),
      queries, qIdCol, qTextCol, k, k1, b)

  /** The persistent piece of a BM25 index: per-(doc, term) postings
    * with term frequencies. Everything else — document length
    * (Σ tf), corpus size, average length, document frequency —
    * DERIVES from this one table, and postings are strictly
    * per-document, so a batch ingest tokenizes only its own docs and
    * appends: no global state is maintained, and scoring over the
    * appended table equals a from-scratch build (the q95 invariant,
    * same shape as incremental CC / exact dedup / vocab merge). */
  def buildPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** BM25 over a [[buildPostings]] table (see [[bm25TopK]] for the
    * query-side semantics and scale shape). */
  def bm25FromPostings(postings: DataFrame,
                       queries: DataFrame, qIdCol: String, qTextCol: String,
                       k: Int, k1: Double = 1.2,
                       b: Double = 0.75): DataFrame = {
    val dl = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val qterms = queries.select(col(qIdCol).as("q_id"),
      explode(array_distinct(split(col(qTextCol), " "))).as("term"))
    val hits = postings
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
    val scored = broadcast(qterms).join(hits, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + (lit(b) * col("dl")) / col("avgdl")))).as("s"))
      .select(col("q_id"), col("doc_id").as("n_id"),
        round(col("s"), 4).as("cos"))
    Similarity.topKPerKey(scored, k)
      .select(col("q_id"), col("n_id").as("doc_id"),
        col("cos").as("score"), col("rk"))
  }

  /** Boolean-AND relevance judgments: a document is relevant to a
    * query iff it contains EVERY query term — the deterministic
    * stand-in for human judgments that makes the eval harness
    * oracle-checkable end-to-end; production swaps in a judged
    * (q_id, doc_id) table and [[evalRanked]] is unchanged.
    * Tokenization matches [[buildPostings]]. */
  def conjunctiveJudgments(df: DataFrame, idCol: String, textCol: String,
                           queries: DataFrame, qIdCol: String,
                           qTextCol: String): DataFrame = {
    val qt = queries.select(col(qIdCol).as("q_id"),
      explode(split(col(qTextCol), " ")).as("term")).distinct()
    val nq = qt.groupBy(col("q_id")).agg(count(lit(1)).as("__n_terms"))
    val dterm = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term")).distinct()
    qt.join(dterm, Seq("term"))
      .groupBy(col("q_id"), col("doc_id")).agg(count(lit(1)).as("__m"))
      .join(nq, Seq("q_id")).filter(col("__m") === col("__n_terms"))
      .select(col("q_id"), col("doc_id"))
  }

  /** IR eval harness: per-query hit count, precision@k, recall@k and
    * MRR@k of a ranked list against a judgment table. Rank-and-count
    * arithmetic only (every division is integer/integer at the end),
    * so the metrics are exact and engine-reproducible. Queries with
    * no relevant documents report recall 0; with no ranked hit, MRR 0.
    *
    * Scale shape: the ranked list is k-bounded per query and the
    * judgment join is on (q_id, doc_id) — both sides are
    * eval-harness-sized, never corpus-sized; the corpus appears only
    * upstream in whatever produced `ranked`. */
  def evalRanked(ranked: DataFrame, judgments: DataFrame,
                 k: Int): DataFrame = {
    val rel = judgments.select(col("q_id"), col("doc_id"),
      lit(true).as("__rel"))
    val nRel = judgments.groupBy(col("q_id")).agg(count(lit(1)).as("n_rel"))
    ranked.filter(col("rk") <= k)
      .join(rel, Seq("q_id", "doc_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(when(col("__rel"), 1L).otherwise(0L)).as("n_hits"),
        min(when(col("__rel"), col("rk"))).as("__first"))
      .join(nRel, Seq("q_id"), "left")
      .select(col("q_id"), col("n_hits"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(col("n_hits") / lit(k.toDouble), 4).as("precision_at_k"),
        round(when(coalesce(col("n_rel"), lit(0L)) > 0,
          col("n_hits").cast("double") / col("n_rel")).otherwise(0.0), 4)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 4).as("mrr"))
  }

  /** GRADED judgments for [[evalNdcg]]: grade = number of DISTINCT
    * query terms the document contains (≥ 1) — the partial-match
    * relevance scale the conjunctive (all-or-nothing) judgments
    * flatten. Same postings-join shape as [[conjunctiveJudgments]]. */
  def gradedJudgments(docs: DataFrame, idCol: String, textCol: String,
                      queries: DataFrame, qIdCol: String,
                      qTextCol: String): DataFrame = {
    val qt = queries.select(col(qIdCol).as("q_id"),
      explode(split(col(qTextCol), " ")).as("term")).distinct()
    val dterm = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term")).distinct()
    qt.join(dterm, Seq("term"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("grade"))
  }

  /** nDCG@k of a ranked list against graded judgments — the rank-
    * position-discounted metric precision/recall/MRR can't express
    * (a relevant doc at rank 1 vs rank 10 scores differently).
    * DCG terms (2^grade − 1)/log2(rank+1) are quantized to 1e-6
    * fixed point BEFORE summing, so the float sum is order-
    * independent and engine-exact (the q172/q193 rule); nDCG is one
    * final long/long division. The IDEAL ranking reuses
    * [[Similarity.topKPerKey]]'s partition-local heaps (grade as the
    * score, doc_id tie-break) — a per-query window over the judgment
    * set would skew on broad-term queries whose judgment lists are
    * corpus-sized. Output: (q_id, dcg_fp, idcg_fp, ndcg round 4);
    * queries with judgments but no ranked hits score 0. */
  def evalNdcg(ranked: DataFrame, graded: DataFrame, k: Int): DataFrame = {
    def term(g: org.apache.spark.sql.Column,
             rk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round((pow(lit(2.0), g.cast("double")) - 1.0) /
        log2(rk.cast("double") + 1.0) * 1e6, 0).cast("long")
    val dcg = ranked.filter(col("rk") <= k)
      .join(graded, Seq("q_id", "doc_id"))
      .groupBy(col("q_id"))
      .agg(sum(term(col("grade"), col("rk"))).as("dcg_fp"))
    val ideal = Similarity.topKPerKey(
      graded.select(col("q_id"), col("doc_id").as("n_id"),
        col("grade").cast("double").as("cos")), k)
    val idcg = ideal
      .groupBy(col("q_id"))
      .agg(sum(term(col("cos"), col("rk"))).as("idcg_fp"))
    idcg.join(dcg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("dcg_fp"), lit(0L)).as("dcg_fp"), col("idcg_fp"),
        round(coalesce(col("dcg_fp"), lit(0L)).cast("double") /
          col("idcg_fp"), 4).as("ndcg"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    * ranked lists from heterogeneous retrievers — the standard way to
    * combine lexical ([[bm25TopK]]) and embedding ([[Similarity]],
    * [[Pq]]) results without calibrating their incomparable scores:
    * fused(d) = Σ_lists 1/(c + rank_list(d)). Each input is
    * (q_id, doc_id, rk); absent-from-a-list contributes nothing.
    * Output: (q_id, doc_id, rrf, rk) — rrf rounded to 6, rk by
    * (rrf desc, doc_id asc).
    *
    * Scale shape: inputs are already top-k-bounded (k × queries rows
    * each), so the union + fuse agg is tiny regardless of corpus
    * size; ranking reuses the partition-local heaps. */
  def rrfFuse(ranked: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    val pooled = ranked
      .map(_.select(col("q_id"), col("doc_id"), col("rk")))
      .reduce(_ unionByName _)
    val fused = pooled.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(lit(1.0) / (lit(c.toDouble) + col("rk"))).as("s"))
      .select(col("q_id"), col("doc_id").as("n_id"),
        round(col("s"), 6).as("cos"))
    Similarity.topKPerKey(fused, k)
      .select(col("q_id"), col("n_id").as("doc_id"),
        col("cos").as("rrf"), col("rk"))
  }
}
