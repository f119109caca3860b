package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.TextFunctions

/** Subword (BPE) tokenization through the oracle gate (q113–q115):
  * the learned merge table, the encoded corpus, and sequence packing
  * metered in real subword tokens instead of whitespace words.
  *
  * The DuckDB oracle re-learns the merges round by round as chained
  * CTEs — the spaced-string representation makes one training round
  * a plain `replace` + pair-count + `ORDER BY ... LIMIT 1`, identical
  * in both engines (see [[Bpe]]), so the merge table, every encoded
  * token, and the packing layout are hash-compared end to end.
  */
object BpeQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = t(s, d, "documents")

  /** The tokenizer artifact is learn-once (like the IVF index and PQ
    * codebooks): cached per (session, dir) so every consumer — and
    * every bench iteration — measures encode, not retraining. */
  private val NumMerges = 10
  private val PackBudget = 1024L

  private val mergeCache =
    scala.collection.concurrent.TrieMap[(String, String), Seq[(String, String)]]()

  private def sessionKey(s: SparkSession): String =
    try s.getClass.getMethod("sessionUUID").invoke(s).asInstanceOf[String]
    catch { case _: ReflectiveOperationException =>
      String.valueOf(System.identityHashCode(s)) }

  private def merges(s: SparkSession, d: String): Seq[(String, String)] =
    mergeCache.getOrElseUpdate((sessionKey(s), d),
      Bpe.learnMerges(docs(s, d), "text", NumMerges))

  def queries: Map[String, Q] = Map(
    // The learned merge table itself — rank order IS the tokenizer.
    "q113_bpe_merges" -> ((s, d) => {
      import s.implicits._
      merges(s, d).zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("rank", "lhs", "rhs")
    }),
    // Corpus encode via the kernel expression (one node at any
    // vocabulary size); the oracle encodes with the composed replace
    // chain, so this also pins kernel == sequential semantics on the
    // full corpus every round.
    "q114_bpe_encode" -> ((s, d) => {
      val toks = TextFunctions.bpeEncode(col("text"), merges(s, d))
      docs(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        array_join(toks, " ").as("toks"))
    }),
    // q47's packing re-metered in subword tokens — the budget now
    // means what a trainer means by it.
    "q115_bpe_packing" -> ((s, d) =>
      Packing.packByBudget(
        docs(s, d).select(col("doc_id"),
          size(TextFunctions.bpeEncode(col("text"), merges(s, d)))
            .cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = PackBudget)),
    // Incremental training: per-slice word tables merge by summed
    // frequency, training over the merged table — must reproduce the
    // from-scratch merges verbatim (SHARES q113's oracle SQL, the
    // q110/q80 invariant pattern). History is never re-tokenized.
    "q119_bpe_incremental" -> ((s, d) => {
      import s.implicits._
      val doc = docs(s, d)
      Bpe.learnMergesFromWords(
          Bpe.mergeWordTables(
            Bpe.wordTable(doc.filter(col("doc_id") % 5 =!= 0), "text"),
            Bpe.wordTable(doc.filter(col("doc_id") % 5 === 0), "text")),
          NumMerges)
        .zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("rank", "lhs", "rhs")
    }),
    // Saved-artifact lifecycle: the tokenizer persisted as a managed
    // table, loaded back, and used to encode — must match the
    // in-session encode exactly (SHARES q114's oracle SQL).
    "q120_bpe_encode_saved" -> ((s, d) => {
      val name = s"graft_bpe_merges_${math.abs(d.hashCode.toLong)}"
      Bpe.saveMerges(s, name, merges(s, d))
      val toks = TextFunctions.bpeEncode(col("text"), Bpe.loadMerges(s, name))
      docs(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        array_join(toks, " ").as("toks"))
    }))

  // ---- oracle SQL ----------------------------------------------------

  /** Training rounds as chained CTEs: words0 is the spaced type
    * table; round r picks best{r} and rewrites words{r+1}. */
  private def trainingCtes(rounds: Int): String = {
    val head =
      """words0 AS MATERIALIZED (
        |  SELECT regexp_replace(word, '([^ ])', ' \1 ', 'g') AS w,
        |         count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) > 0 GROUP BY 1)""".stripMargin
    val steps = (0 until rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS cnt
         |  FROM (SELECT string_split(trim(w), '  ') AS syms, freq FROM words$r),
         |       UNNEST(generate_series(1, len(syms)-1)) AS u(i)
         |  GROUP BY 1, 2 HAVING sum(freq) >= 2),
         |b$r AS MATERIALIZED (SELECT a, b FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |words${r + 1} AS MATERIALIZED (
         |  SELECT replace(w, ' '||(SELECT a FROM b$r)||'  '||(SELECT b FROM b$r)||' ',
         |                    ' '||(SELECT a||b FROM b$r)||' ') AS w, freq
         |  FROM words$r)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The composed encode of `documents.text` after `rounds` merges,
    * as a SQL expression yielding the token list. */
  private def encodeExpr(rounds: Int): String = {
    val spacedDoc = "regexp_replace(text, '([^ ])', ' \\1 ', 'g')"
    val chain = (0 until rounds).foldLeft(spacedDoc) { (e, r) =>
      s"replace($e, ' '||(SELECT a FROM b$r)||'  '||(SELECT b FROM b$r)||' ', " +
        s"' '||(SELECT a||b FROM b$r)||' ')"
    }
    s"regexp_split_to_array(trim($chain), ' {2,}')"
  }

  private lazy val mergesSql =
    s"""WITH ${trainingCtes(NumMerges)}
       |SELECT * FROM (
       |${(0 until NumMerges).map(r =>
           s"  SELECT ${r}::BIGINT AS rank, a AS lhs, b AS rhs FROM b$r")
           .mkString("  UNION ALL\n")}
       |) ORDER BY rank""".stripMargin

  private lazy val encodeSql =
    s"""WITH ${trainingCtes(NumMerges)},
       |enc AS (SELECT doc_id, ${encodeExpr(NumMerges)} AS toks FROM documents)
       |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       |       array_to_string(toks, ' ') AS toks
       |FROM enc""".stripMargin

  def oracle: Map[String, String] = Map(
    "q113_bpe_merges" -> mergesSql,
    // q119 is the incrementally-trained form of the SAME merges; q120
    // the saved-then-loaded form of the SAME encode — the from-scratch
    // oracles apply verbatim (the q110/q80 invariant pattern).
    "q119_bpe_incremental" -> mergesSql,
    "q114_bpe_encode" -> encodeSql,
    "q120_bpe_encode_saved" -> encodeSql,
    "q115_bpe_packing" ->
      s"""WITH ${trainingCtes(NumMerges)},
         |tc AS (SELECT doc_id,
         |  len(${encodeExpr(NumMerges)})::BIGINT AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
         |  FROM tc)
         |SELECT doc_id, n_tokens, CAST(s // $PackBudget AS BIGINT) AS seq_id
         |FROM c""".stripMargin)

  /** Release the cached tokenizer artifacts (test hygiene). */
  def clearCache(): Unit = mergeCache.clear()
}
