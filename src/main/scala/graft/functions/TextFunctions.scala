package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, hashing, language-ID scoring, quality
  * features, fingerprints. All pure `functions._` compositions
  * (codegen'd, no UDFs) so they run inside whole-stage codegen on
  * every executor — nothing here touches the driver.
  */
object TextFunctions {

  /** Whitespace tokens. (The synthetic corpus is single-space
    * separated; `\\s+` keeps it robust to real text.) */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Contiguous word n-grams ("shingles") as an array column — the
    * native [[ShinglesExpr]] (one split per document, codegen'd).
    * The composed higher-order-function form is kept as
    * [[shinglesComposed]]; Catalyst inlines its `split` into every
    * `element_at`, re-splitting the document per shingle (quadratic —
    * it alone accounted for most of the minhash family's runtime). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(ShinglesExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** Unicode NFC normalization — the native [[NfcNormalize]]
    * expression (codegen projection; already-normalized text, i.e.
    * nearly all of a web corpus, passes through allocation-free).
    * Run it BEFORE any hashing/dedup/vocab stage: composed and
    * decomposed spellings of the same grapheme are byte-unequal
    * until normalized. */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(NfcNormalize(
      org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** Composed reference form; empty array when the document has
    * fewer than `n` tokens — guarded explicitly because Spark's
    * `sequence(0, negative)` would otherwise generate a DESCENDING
    * range. */
  def shinglesComposed(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k + 1))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Salted md5 — the portable hash family used for MinHash/SimHash
    * (md5 is identical in Spark and DuckDB, so oracle checks are
    * exact; hex strings compare lexicographically as unsigned). */
  def saltedMd5(salt: Column, s: Column): Column =
    md5(concat(salt.cast("string"), lit("|"), s))

  /** ±1 vote for SimHash bit `b` of token `w`: the top bit of the
    * first hex nibble of a per-bit salted md5 (hex chars '8'..'f'
    * sort after '8'). */
  def simhashVote(b: Column, w: Column): Column =
    when(substring(saltedMd5(b, w), 1, 1) >= "8", lit(1)).otherwise(lit(-1))

  /** Count of tokens belonging to a fixed marker-word set (the
    * SQL-expressible core of n-gram/stopword language scoring). */
  def markerCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words.map(lit(_)): _*))).cast("long")

  /** Normalized text for fingerprinting: lowercase, collapsed
    * whitespace, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** 64-bit-hex document fingerprint over normalized text. */
  def fingerprint(text: Column): Column =
    substring(md5(normalized(text)), 1, 16)

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric symbols each count as one token. */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  /** Flat BPE token sequence for a document via the learned merge
    * list — a single kernel expression node at any vocabulary size
    * (see [[BpeEncodeExpr]]; [[graft.operators.Bpe.encodeComposed]]
    * is the oracle-expressible composed twin). */
  def bpeEncode(text: Column, merges: Seq[(String, String)],
                byteLevel: Boolean = false,
                specials: Seq[String] = Nil,
                preserveSpaces: Boolean = false): Column =
    org.apache.spark.sql.GraftSqlBridge.column(BpeEncodeExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(text),
      merges.map(m => Array(m._1, m._2)).toArray, byteLevel,
      specials.toArray, preserveSpaces))

  /** English-y stopwords used for quality scoring. */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
}
