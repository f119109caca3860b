package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram (SentencePiece-style) tokenizer — the OTHER tokenizer
  * family real pipelines train (Kudo 2018): a subword vocabulary is
  * seeded from frequent substrings, each word is segmented by Viterbi
  * under the current vocabulary scores, and hard-EM rounds re-estimate
  * scores from the segmentation's own usage counts, pruning tokens
  * the segmenter never uses. Where BPE grows merges bottom-up, the
  * unigram model starts from an over-complete candidate set and
  * carves it down — the two families share nothing but the word
  * table, which is exactly why both belong in the library.
  *
  * Scoring is the deterministic integer variant: a segmentation is
  * ranked by (fewest tokens, then highest total token frequency, then
  * lexicographically smallest space-joined rendering). The real
  * SentencePiece maximizes Σ log p — a float sum whose ties and ulps
  * an independent engine cannot be guaranteed to reproduce; the
  * integer order keeps every comparison exact in both engines, so the
  * whole trainer sits inside the oracle gate instead of behind an
  * epsilon. The DP is the same Viterbi shape either way.
  *
  * Every operator here works at WORD-TABLE grain (distinct words with
  * corpus frequencies — the [[Bpe]] discipline): training and
  * segmentation never touch the corpus, whose only appearance is the
  * final per-document join in [[encode]].
  */
object Unigram {

  /** All substrings of length 1..`maxLen` UNITS of every word,
    * weighted by word frequency (every occurrence position counts — a
    * substring appearing twice in one word contributes twice).
    * `unit` is the atomic symbol width in characters: 1 for char
    * mode; 2 for byte mode over hex-rendered words, where substrings
    * are taken only at byte-aligned positions with byte-multiple
    * lengths (a half-byte token could match mid-byte and make decode
    * garbage). Output: (token, cnt). Word-table-sized × maxLen
    * fanout, never the corpus. */
  def substringCounts(words: DataFrame, maxLen: Int,
                      unit: Int = 1): DataFrame = {
    require(maxLen >= 1 && unit >= 1,
      s"maxLen/unit must be >= 1, got $maxLen/$unit")
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("word"), col("freq").cast("long").as("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        val units = w.length / unit
        for {
          i <- 0 until units
          l <- 1 to math.min(maxLen, units - i)
        } yield (w.substring(i * unit, (i + l) * unit), f)
      }
      .toDF("token", "freq")
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
  }

  /** The seed vocabulary: the `topK` highest-count substrings
    * (count desc, token asc — deterministic at the boundary) UNION
    * every single unit (so Viterbi always has a complete cover),
    * deduplicated. Output: (token, cnt). With every vocabulary token
    * a whole number of units and Viterbi starting at position zero,
    * all reachable positions stay unit-aligned — byte-mode alignment
    * holds by construction. */
  def seedVocab(words: DataFrame, maxLen: Int, topK: Int,
                unit: Int = 1): DataFrame = {
    val counts = substringCounts(words, maxLen, unit)
    val top = counts.orderBy(col("cnt").desc, col("token").asc).limit(topK)
    val chars = counts.filter(length(col("token")) === unit)
    top.unionByName(chars).groupBy(col("token"))
      .agg(max(col("cnt")).as("cnt")) // same source rows — max == the value
  }

  /** Viterbi-best segmentation under the integer order: fewest
    * tokens, then highest Σ freq, then lexicographically smallest
    * space-joined rendering. Exact DP: equal-token-count paths to the
    * same position have equal joined length (word chars + n−1
    * spaces), so the string comparison is decided inside the prefix
    * and appending a common suffix preserves it. */
  private[graft] def viterbi(w: String, vocab: Map[String, Long],
                             maxLen: Int): Option[Seq[String]] = {
    final case class P(n: Int, fs: Long, joined: String, toks: List[String])
    val dp = new Array[P](w.length + 1)
    dp(0) = P(0, 0L, "", Nil)
    var i = 1
    while (i <= w.length) {
      var best: P = null
      var l = 1
      val lim = math.min(maxLen, i)
      while (l <= lim) {
        val prev = dp(i - l)
        if (prev != null) {
          val t = w.substring(i - l, i)
          vocab.get(t) match {
            case Some(f) =>
              val joined = if (prev.joined.isEmpty) t
                else prev.joined + " " + t
              val better = best == null ||
                prev.n + 1 < best.n ||
                (prev.n + 1 == best.n && (prev.fs + f > best.fs ||
                  (prev.fs + f == best.fs && joined < best.joined)))
              if (better) best = P(prev.n + 1, prev.fs + f, joined, t :: prev.toks)
            case None =>
          }
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    Option(dp(w.length)).map(_.toks.reverse)
  }

  /** Segment every word of the table under `vocab` (a bounded
    * artifact — topK + alphabet — broadcast like the BPE merge list
    * and the IVF centroids). Output: (word, freq, toks) with `toks`
    * the space-joined segmentation. A word the vocabulary cannot
    * cover fails loudly — with the seed's single-char floor that
    * means the vocab and corpus disagree, not a data quirk. */
  def segmentWords(words: DataFrame, vocab: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val v = vocab.select(col("token"), col("cnt").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxLen = if (v.isEmpty) 1 else v.keysIterator.map(_.length).max
    val bc = spark.sparkContext.broadcast(v)
    words.select(col("word"), col("freq").cast("long").as("freq"))
      .as[(String, Long)]
      .map { case (w, f) =>
        val toks = viterbi(w, bc.value, maxLen).getOrElse(
          throw new IllegalStateException(
            s"vocabulary cannot cover word '$w' — corpus/vocab mismatch"))
        (w, f, toks.mkString(" "))
      }
      .toDF("word", "freq", "toks")
  }

  /** One hard-EM round: re-estimate token scores as the frequency-
    * weighted usage counts of the current segmentation, implicitly
    * PRUNING every token the segmenter never used (the SentencePiece
    * carve-down, in its hard-assignment form). Output: (token, cnt) —
    * the next round's vocabulary. */
  def refit(words: DataFrame, vocab: DataFrame): DataFrame =
    segmentWords(words, vocab)
      .select(col("freq"), explode(split(col("toks"), " ")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))

  /** Fold two word tables — the batch-ingest primitive (the
    * [[Bpe.mergeWordTables]] contract for the raw-word grain this
    * family trains on): union by word, frequencies summed. Training
    * is a pure function of the word table, so seed → EM over the
    * folded table reproduces from-scratch training verbatim — history
    * is never re-tokenized, and per-slice word tables are the only
    * state an ingest pipeline persists between batches. */
  def mergeWordTables(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word")).agg(sum(col("freq")).as("freq"))

  /** Per-document encode under a vocabulary: each word replaced by
    * its Viterbi segmentation, document order preserved. The corpus
    * appears exactly once — exploded to positioned words, joined to
    * the word-table segmentation, reassembled. Output:
    * (idCol, n_tokens, toks). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame = {
    val words = Bpe.wordTableRaw(docs, textCol)
    val seg = segmentWords(words, vocab)
      .select(col("word"), col("toks"),
        size(split(col("toks"), " ")).cast("long").as("__nt"))
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(seg, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__nt")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks")), " ").as("toks"))
  }
}
