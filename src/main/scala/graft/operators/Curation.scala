package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: PII
  * redaction, boilerplate line removal, rule-based quality gating
  * (Gopher-style), deterministic source mixing, and the keep-one
  * dedup materialization that turns dup GROUPS into a deduplicated
  * corpus.
  *
  * Everything here is designed for the 100 TB regime:
  *  - redaction and quality gating are pure per-row projections
  *    (regexp/array expressions, whole-stage codegen, zero shuffles);
  *  - boilerplate removal shuffles 8-byte line hashes — never line
  *    text — to build the document-frequency table, and only kept
  *    lines move in the (unavoidable) output reassembly;
  *  - mix-sampling decides membership from a deterministic per-row
  *    hash, so it is reproducible across runs/retries and needs no
  *    shuffle, no RNG state, and no driver coordination;
  *  - keep-one materialization anti-joins the corpus against the
  *    (small) drop set — AQE broadcasts it.
  */
object Curation {

  /** Ordered PII scrub rules (pattern → placeholder). Patterns stick
    * to the regex subset with identical semantics in Java regex and
    * RE2 (DuckDB), so redaction is exactly oracle-checkable: character
    * classes, bounded repetition, ASCII word boundaries. Order
    * matters (emails contain dots; IPs contain digit runs) and is
    * part of the operator's contract. */
  val PiiRules: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{9,}\\b" -> "<ID>")

  /** Scrubbed text: every rule applied in order. A chain of
    * `regexp_replace` calls — codegen'd, no UDF, no shuffle. */
  def redactPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Count of placeholders present after [[redactPii]]. */
  def redactionCount(redacted: Column): Column =
    regexp_count(redacted, lit("<(EMAIL|PHONE|IP|ID)>")).cast("long")

  /** Remove boilerplate LINES from documents (RefinedWeb/CCNet-style):
    * a line occurring in at least `minDocs` distinct documents
    * (navigation, cookie banners, license footers) is dropped from
    * every document; documents keep their remaining lines in order.
    * Documents whose lines are all boilerplate disappear.
    *
    * Output: (idCol, clean, n_kept) — the reassembled text and its
    * surviving line count.
    *
    * Scale shape: document frequency is aggregated over
    * `xxhash64(line)` — the corpus shuffles 8-byte hashes, not text
    * (a 64-bit collision merging two lines' counts is ~2⁻⁶⁴ per line
    * pair — ignorable at corpus scale). The boilerplate-hash set is
    * the head of the line-frequency distribution (small), so AQE
    * broadcasts the anti-join; the only text movement is the output
    * reassembly itself. */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                           minDocs: Long): DataFrame =
    dropRepeatedUnits(df, idCol, textCol, sep = "\n", minDocs, identity)

  /** Remove repeated PARAGRAPHS (RefinedWeb §3's middle dedup grain,
    * between document-level groups and boilerplate lines): a paragraph
    * whose CANONICAL form (lowercased, whitespace collapsed) occurs in
    * at least `minDocs` distinct documents is dropped from every
    * document — catching templated paragraphs that differ only in
    * case/spacing, which exact line hashing misses. Same output
    * contract and scale shape as [[dropBoilerplateLines]]: frequency
    * counts shuffle 8-byte canonical-paragraph hashes, never text. */
  def dropRepeatedParagraphs(df: DataFrame, idCol: String, textCol: String,
                             minDocs: Long): DataFrame =
    dropRepeatedUnits(df, idCol, textCol, sep = "\n\n", minDocs,
      u => trim(regexp_replace(lower(u), "\\s+", " ")))

  /** Shared machinery for line- and paragraph-grain repeated-unit
    * removal: split on `sep`, hash each unit's `canon` form, count
    * document frequency over the hashes, anti-join the over-frequent
    * set (AQE-broadcast — it is the small head of the distribution),
    * reassemble survivors in original order joined by `sep`. */
  private def dropRepeatedUnits(df: DataFrame, idCol: String, textCol: String,
                                sep: String, minDocs: Long,
                                canon: Column => Column): DataFrame = {
    val units = df
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "unit")))
      .withColumn("uh", xxhash64(canon(col("unit"))))
    val repeated = units
      .select(col(idCol), col("uh"))
      .groupBy(col("uh"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("uh"))
    units.join(repeated, Seq("uh"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
            s => s.getField("unit")),
          sep).as("clean"),
        count(lit(1)).as("n_kept"))
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1, the
    * SQL-expressible core): per-document word count, mean word
    * length, symbol-to-word ratio, and distinct-stopword presence,
    * plus the composite pass/fail. Pure projection — every signal is
    * an array/regexp expression over the token array, evaluated once
    * per row inside codegen. */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    minDistinctStopwords: Int = 2): DataFrame = {
    import graft.functions.TextFunctions._
    val t = col(textCol)
    df.select(
        col(idCol),
        size(tokens(t)).cast("long").as("n_words"),
        round(length(regexp_replace(t, " ", "")) / size(tokens(t)), 4)
          .as("mean_word_len"),
        round(regexp_count(t, lit("#|\\.\\.\\.")) / size(tokens(t)), 4)
          .as("symbol_ratio"),
        size(array_distinct(filter(tokens(t),
          w => w.isin(StopWords.map(lit(_)): _*)))).cast("long")
          .as("n_stop_distinct"))
      .withColumn("passes",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("n_stop_distinct") >= minDistinctStopwords)
  }

  /** Deterministic per-row sampling decision in [0, 1): the first 4
    * hex chars of `md5(key || '|' || salt)` compared against the
    * rate's hex threshold. Reproducible (retries/backfills sample
    * identically), uniform, shuffle-free — and md5 is identical in
    * DuckDB, so sampling decisions are exactly oracle-checkable. */
  def hashFraction(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit("|" + salt))), 1, 4)

  private def hexThreshold(frac: Double): String = {
    // cap at 0xffff, NOT 0x10000: 0x10000 formats as the 5-char string
    // "10000", and `hashFraction < "10000"` lexicographically matches
    // only hashes starting with '0' (~6%) instead of ~100%. A frac
    // rounding up to 1.0 thus keeps 65535/65536 — off by 2^-16, not 94%.
    val v = math.max(0, math.min(0xffff, math.round(frac * 0x10000).toInt))
    f"$v%04x"
  }

  /** Weighted source mixing — the data-mixture operator of LLM
    * training (e.g. upsample curated sources, downsample crawl).
    * `weights` maps a source value to its sampling weight: 0.25 keeps
    * a quarter of rows, 2.0 emits every row twice, 1.5 emits every
    * row once plus a second copy for half of them. Unlisted sources
    * get `defaultWeight`.
    *
    * Output: input columns + `copy_idx` (1..copies). Copies come from
    * `explode(sequence(...))` — a narrow projection; membership is a
    * deterministic [[hashFraction]] on the id, so the whole operator
    * is shuffle-free and reproducible. */
  def mixBySource(df: DataFrame, idCol: String, sourceCol: String,
                  weights: Map[String, Double],
                  defaultWeight: Double = 1.0,
                  salt: String = "mix"): DataFrame = {
    def copiesFor(w: Double): Column = {
      val base = math.floor(w).toLong
      val frac = w - base
      lit(base) + when(hashFraction(col(idCol), salt) < hexThreshold(frac), 1L)
        .otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1)
      .foldRight(copiesFor(defaultWeight)) { case ((src, w), els) =>
        when(col(sourceCol) === src, copiesFor(w)).otherwise(els)
      }
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Deterministic per-source contribution cap (the RefinedWeb-style
    * "at most N documents per domain" guard against a handful of hosts
    * dominating the mixture): documents rank within their source by a
    * salted md5 of the id — a reproducible shuffle-order-independent
    * pseudo-random draw, identical in DuckDB — and ranks beyond
    * `maxDocs` drop. Output: input columns + `src_rank`.
    *
    * Scale shape: one exchange on the source key (the grouping is the
    * work); rank is a within-partition sort. A pathologically hot
    * source makes that partition big — [[capPerSourceScalable]] is the
    * EXACT fix (range-bucketed two-phase rank, prunes the hot source
    * before sorting); [[mixBySource]] with weight maxDocs/|source| is
    * the shuffle-free approximation when exact N doesn't matter. */
  def capPerSource(df: DataFrame, idCol: String, sourceCol: String,
                   maxDocs: Int, salt: String = "cap"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(hashRank(col(idCol), salt), col(idCol))
    df.withColumn("src_rank", row_number().over(w).cast("long"))
      .filter(col("src_rank") <= maxDocs)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * priority sampling): every row draws a deterministic exponential
    * variate e = -ln(u) from its salted hash and the k rows with
    * smallest e/weight win — equivalent to keeping the k largest
    * u^(1/w) keys, the classic one-pass weighted reservoir. The
    * quality-weighted subsampling primitive: "take 1M documents,
    * proportional to quality score, no duplicates, reproducibly".
    *
    * Determinism across engines: u = (hash48+1)/2^48 (exact
    * power-of-two divide), and e is fixed-pointed at 1e6 BEFORE the
    * weight divide so libm last-ulp noise cannot reorder priorities;
    * ties (quantization collisions) break on the id. The selection is
    * top-k by a computed column — TakeOrderedAndProject, per-partition
    * heaps, no global sort. Output: input columns + `priority`. */
  def weightedSample(df: DataFrame, idCol: String, wCol: String, k: Int,
                     salt: String = "ws"): DataFrame = {
    require(k >= 1)
    val u = (Sketches.hash48(concat(col(idCol).cast("string"),
      lit("|" + salt))) + 1).cast("double") /
      lit(Sketches.Hash48Max.toDouble)
    df.withColumn("__efp", round(-log(u) * 1e6).cast("long"))
      .withColumn("priority", expr(s"__efp * 1000000L div $wCol"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .drop("__efp")
  }

  /** [[capPerSource]] shaped for the pathologically hot source — the
    * shuffle-feasible EXACT form (same output, spec-pinned), replacing
    * the approximation [[capPerSource]]'s docs point to. Ranking goes
    * two-phase over RANGE buckets of the order key (the md5 rank
    * string's leading two hex chars — lexicographic order aligns with
    * bucket order by construction, so per-bucket ranks + bucket
    * offsets reproduce the global rank exactly):
    *
    *  1. per-(source, bucket) counts — map-side combined down to at
    *     most sources×256 rows — cumulated into bucket offsets; a
    *     bucket whose offset already reaches `maxDocs` is dropped
    *     THERE, so a hot source prunes to its first ~maxDocs rows of
    *     sort work no matter how many rows it has;
    *  2. rank within (source, bucket) — 256-way narrower partitions
    *     than the window form's one-partition-per-source — plus the
    *     broadcast offset.
    */
  def capPerSourceScalable(df: DataFrame, idCol: String, sourceCol: String,
                           maxDocs: Int, salt: String = "cap"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = df.withColumn("__rk", hashRank(col(idCol), salt))
      .withColumn("__b", substring(col("__rk"), 1, 2))
    val offsets = withB.groupBy(col(sourceCol), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.partitionBy(col(sourceCol))
          .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("__off") < maxDocs) // later buckets can't rank <= maxDocs
      .select(col(sourceCol), col("__b"), col("__off"))
    val w = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__rk"), col(idCol))
    withB.join(broadcast(offsets), Seq(sourceCol, "__b"))
      .withColumn("src_rank",
        (col("__off") + row_number().over(w)).cast("long"))
      .filter(col("src_rank") <= maxDocs)
      .drop("__rk", "__b", "__off")
  }

  /** Deterministic train/validation/test assignment — the holdout
    * split every training pipeline makes before packing. Membership
    * is a [[hashFraction]] threshold chain on the id: a pure
    * projection (shuffle-free, partition-order-independent,
    * reproducible across runs AND engines — md5 is md5 in DuckDB
    * too), so a document's split NEVER changes as the corpus grows.
    * That stability is the point: eval membership decided at first
    * ingest stays fixed across every later batch, which is what keeps
    * the held-out sets uncontaminated under incremental ingest.
    *
    * `fractions` are (name, mass) in order; they must sum to 1.
    * Boundaries quantize to 1/65536 (the [[hashFraction]] grain), the
    * same resolution [[mixBySource]] documents. */
  def splitAssign(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)] =
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                  salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $fractions")
    val h = hashFraction(col(idCol), salt)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val assigned = fractions.map(_._1).zip(cum).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((name, c), els) =>
        when(h < lit(hexThreshold(c)), name).otherwise(els)
      }
    df.withColumn("split", assigned)
  }

  /** Full-width salted hash for ranking (32 hex chars —
    * [[hashFraction]]'s 4-char prefix is enough for thresholding but
    * would tie too often as a sort key). */
  private def hashRank(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit("|" + salt)))

  /** Per-vector int8 scalar quantization — the storage/bandwidth
    * compression step of an embedding pipeline (4× smaller than
    * float32; recall loss is bounded by the per-vector range). Adds
    * `vmin` (offset), `scale`, and `qvec` (array<int> in 0..255,
    * `q = round((v - vmin) / scale)`). Constant vectors quantize to
    * all-zeros via the `1e-12` scale floor.
    *
    * Pure per-row projection (no shuffle); min/scale are materialized
    * as their own projected columns so the per-element lambda does
    * not recompute the array scan per element. Dequantization error
    * is ≤ scale/2 per component ([[dequantInt8]]; spec-asserted). */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("vmin", array_min(col("__v")))
      .withColumn("scale",
        greatest((array_max(col("__v")) - col("vmin")) / 255.0, lit(1e-12)))
      .withColumn("qvec",
        transform(col("__v"),
          x => round((x - col("vmin")) / col("scale"), 0).cast("int")))
      .drop("__v")

  /** Reconstruct approximate doubles from [[quantizeInt8]] output. */
  def dequantInt8(qvec: Column, vmin: Column, scale: Column): Column =
    transform(qvec, x => x.cast("double") * scale + vmin)

  /** Keep-one dedup materialization: given the corpus and its dup
    * groups ((id, keep_id) from [[Dedup.connectedComponents]]), drop
    * every clustered document except its group's canonical keeper —
    * the step that turns dedup ANALYSIS into the deduplicated corpus.
    *
    * The drop set (clustered non-keepers) is tiny relative to the
    * corpus, so the anti-join broadcasts under AQE; the corpus itself
    * never shuffles. */
  def keepOne(corpus: DataFrame, idCol: String, groups: DataFrame): DataFrame = {
    val drop = groups.filter(col("id") =!= col("keep_id"))
      .select(col("id").as(idCol))
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Hashing-trick featurization (Weinberger et al., ICML 2009): token
    * → bucket = md5-prefix mod `dim`, counted per document — sparse
    * bag-of-words features with NO vocabulary table, no OOV, and no
    * training pass; the standard corpus-scale featurizer for linear
    * quality classifiers. Output: (id, bucket, cnt), absent buckets
    * are implicit zeros.
    *
    * Scale shape: a pure hash projection plus one (id, bucket) agg —
    * map-side combined, nothing corpus-wide; contrast [[buildVocab]],
    * whose id assignment needs the global frequency rank. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .select(col(idCol),
        (conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") % dim)
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Temperature-flattened source weights (the α-sampling rule of the
    * multilingual/mixture lineage — mBERT/XLM-R/PaLM): target share of
    * source s is p_s ∝ (n_s/N)^α, so α = 1 reproduces the natural
    * distribution, α = 0 equalizes all sources, and 0 < α < 1
    * upsamples small sources / downsamples dominant ones. Returns the
    * per-source replication weight w_s = p_s·N / (Z·n_s) in
    * [[mixBySource]]'s expected-copies form (Σ n_s·w_s = N: the
    * flattening reshapes, not grows, the corpus).
    *
    * The per-source count table is #sources-sized and collects on the
    * driver — bounded metadata, like IVF centroids; sums run in
    * sorted-source order so the weights are reproducible. */
  def temperatureWeights(df: DataFrame, sourceCol: String,
                         alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
      .sortBy(_._1)
    val tot = counts.map(_._2).sum
    val ps = counts.map { case (s, n) => s -> math.pow(n / tot, alpha) }
    val z = ps.map(_._2).sum
    ps.zip(counts).map { case ((s, p), (_, n)) => s -> p / z * tot / n }.toMap
  }

  /** Per-key [[zScoreGate]]: the metric is z-scored against ITS KEY's
    * distribution (each event type / source / language has its own
    * baseline rate — a global gate would flag every row of a rare key).
    * Output: (keyCol, idCol, valueCol, z, pass).
    *
    * Scale shape: the stats table is key-count-sized (one exchange,
    * map-side combined) and joins back AQE-broadcast; everything else
    * is projection. */
  def zScoreGatePerKey(df: DataFrame, keyCol: String, idCol: String,
                       valueCol: String, maxAbsZ: Double = 2.0): DataFrame = {
    val st = df.groupBy(col(keyCol))
      .agg(avg(col(valueCol)).as("__mu"), stddev(col(valueCol)).as("__sd"))
    df.join(st, Seq(keyCol))
      .select(col(keyCol), col(idCol), col(valueCol),
        (round((col(valueCol) - col("__mu")) / col("__sd"), 4) + lit(0.0)).as("z"))
      .withColumn("pass", abs(col("z")) <= lit(maxAbsZ))
  }

  /** Intra-document repetition removal: within each document, keep
    * only the FIRST occurrence of each (canonicalized) unit — the
    * de-looping pass for scraped pages whose template repeats a
    * paragraph, and for generation artifacts that loop. Cross-doc
    * boilerplate is [[dropRepeatedParagraphs]]' job; this one needs no
    * document-frequency table at all. Output: (id, clean, n_kept,
    * n_dropped).
    *
    * Scale shape: one exchange (the per-document group) carrying
    * (id, pos, unit, hash); first-occurrence selection is min(pos)
    * per (id, hash) folded map-side — no window function — and
    * reassembly sorts each document's kept units locally. */
  def dedupUnitsWithin(df: DataFrame, idCol: String, textCol: String,
                       sep: String = "\n\n",
                       canon: Column => Column =
                         u => trim(regexp_replace(lower(u), "\\s+", " ")))
  : DataFrame = {
    val units = df
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "unit")))
      .withColumn("uh", xxhash64(canon(col("unit"))))
    val firsts = units
      .groupBy(col(idCol), col("uh"))
      .agg(min(col("pos")).as("pos"), min_by(col("unit"), col("pos")).as("unit"),
        count(lit(1)).as("n_occ"))
    firsts.groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
            s => s.getField("unit")),
          sep).as("clean"),
        count(lit(1)).as("n_kept"),
        (sum(col("n_occ")) - count(lit(1))).as("n_dropped"))
  }

  /** Collapse CONSECUTIVE duplicate units (run-length dedup): `a a a
    * b a` → `a b a`. The cleanup for stuttered crawl/log/chat text —
    * position-aware, so the later reappearance of a unit survives,
    * which set-grain ([[dedupUnitsWithin]]) would merge. Output:
    * (id, clean, n_kept, n_dropped).
    *
    * Scale shape: the lag window and the reassembly both partition on
    * the document id — per-document work, one exchange, no global
    * sort. */
  def collapseRuns(df: DataFrame, idCol: String, textCol: String,
                   sep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val units = df
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "unit")))
      .withColumn("__prev", lag(col("unit"), 1).over(w))
      .withColumn("__keep", col("__prev").isNull || col("__prev") =!= col("unit"))
    units.groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(
            when(col("__keep"), struct(col("pos"), col("unit"))))),
            s => s.getField("unit")),
          sep).as("clean"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Corpus-relative outlier gate: z-score each row's metric against
    * the corpus mean/sample-stddev and flag rows within `maxAbsZ` —
    * the distribution-aware form of a fixed-threshold quality gate
    * (perplexity filtering in the CCNet/Gopher lineage: docs that are
    * "too surprising" are noise, "too predictable" are boilerplate —
    * both tails cut relative to THIS corpus, not absolute constants
    * that rot as the corpus drifts).
    *
    * Output: (idCol, valueCol, z rounded 4, pass). Scale shape: one
    * scalar aggregate broadcast back via crossJoin — no second pass,
    * no sort, and the gate itself is a pure projection. */
  def zScoreGate(df: DataFrame, idCol: String, valueCol: String,
                 maxAbsZ: Double = 2.0): DataFrame = {
    val st = df.agg(avg(col(valueCol)).as("__mu"),
      stddev(col(valueCol)).as("__sd"))
    df.crossJoin(broadcast(st))
      .select(col(idCol), col(valueCol),
        // + 0.0 canonicalizes IEEE -0.0 (a just-below-mean value
        // rounding to zero) to +0.0
        (round((col(valueCol) - col("__mu")) / col("__sd"), 4) + lit(0.0)).as("z"))
      .withColumn("pass", abs(col("z")) <= lit(maxAbsZ))
  }

  /** Quality-classifier INFERENCE over the hashing-trick features:
    * linear score = Σ cnt_b · w_b over [[hashedFeatures]] buckets,
    * gated at `threshold` — the serving half of the fastText-style
    * corpus quality classifier whose training half eats q89's
    * feature table. Weights here are a deterministic integer
    * stand-in derived from the bucket id ((b mod 7) − 3 ∈ [−3,3]),
    * which keeps the whole dot product in exact integer arithmetic
    * (sum order can never flip a bit, so the gate is reproducible
    * across engines and partitionings); production swaps in a
    * learned float weight array broadcast by bucket id — the shape
    * is identical.
    *
    * Scale shape: one exchange (the per-(doc,bucket) count, map-side
    * combined), then a per-doc fold — the weight "join" is pure
    * arithmetic on the bucket id, so nothing joins at all. Output:
    * (idCol, score, pass). */
  def linearScoreGate(df: DataFrame, idCol: String, textCol: String,
                      dim: Int, threshold: Long = 0L): DataFrame =
    hashedFeatures(df, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * (col("bucket") % 7 - 3)).as("score"))
      .withColumn("pass", col("score") >= threshold)

  /** Multinomial Naive-Bayes TRAINING over the hashing-trick features
    * — the training half [[linearScoreGate]]'s scaladoc promised: a
    * labeled seed set in, a per-bucket weight table out, which
    * [[nbGate]] then serves exactly like the fixed-weight gate. This
    * closes the train → gate → eval loop a real curation pipeline
    * runs (fastText-style quality classifiers are trained exactly
    * so: count aggregates plus a log transform — nothing iterative).
    *
    * `labels` holds (idCol, y ∈ {0, 1}) for the seed documents only.
    * Per class c the trainer needs just Σ cnt over each bucket and
    * the class totals; with add-one smoothing the per-bucket
    * log-likelihood ratio is
    * w_b = ln((c1_b + 1)/(T1 + dim)) − ln((c0_b + 1)/(T0 + dim)),
    * and the class-prior log-odds ln(n1/n0) is emitted as the
    * `bucket = -1` bias row. Weights are QUANTIZED to fixed-point
    * integers (round(10⁴·w)) so downstream scoring is exact integer
    * arithmetic — sum order can never flip a bit, the property that
    * makes the gate reproducible across engines and partitionings
    * (the [[linearScoreGate]] contract, now with learned weights).
    *
    * Scale shape: one (bucket, class) aggregation over the seed
    * features — map-side combined, dim·2 result rows — plus two
    * scalar totals; the dense 0..dim−1 grid comes from a range, not
    * the corpus. Nothing here scales with corpus size except the one
    * seed-set feature pass. Output: (bucket, w), dim + 1 rows. */
  def nbTrain(df: DataFrame, idCol: String, textCol: String,
              labels: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = df.sparkSession
    val lab = labels.select(col(idCol), col("y").cast("int").as("__y"))
    val f = hashedFeatures(df, idCol, textCol, dim).join(lab, Seq(idCol))
    val perBucket = f.groupBy(col("bucket")).agg(
      sum(when(col("__y") === 1, col("cnt")).otherwise(0L)).as("__c1"),
      sum(when(col("__y") === 0, col("cnt")).otherwise(0L)).as("__c0"))
    val dense = spark.range(dim).select(col("id").as("bucket"))
      .join(broadcast(perBucket), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("__c1"), lit(0L)).as("__c1"),
        coalesce(col("__c0"), lit(0L)).as("__c0"))
    val tot = dense.agg(sum(col("__c1")).as("__t1"), sum(col("__c0")).as("__t0"))
    val prior = lab.agg(sum(col("__y")).cast("double").as("__n1"),
      (count(lit(1)) - sum(col("__y"))).cast("double").as("__n0"))
    dense.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(lit(10000) * (
          log((col("__c1") + 1.0) / (col("__t1") + dim)) -
          log((col("__c0") + 1.0) / (col("__t0") + dim))), 0)
          .cast("long").as("w"))
      .unionAll(prior.select(lit(-1L).as("bucket"),
        round(lit(10000) * log(col("__n1") / col("__n0")), 0)
          .cast("long").as("w")))
  }

  /** MULTICLASS [[nbTrain]]: one weight row per (bucket, class) plus
    * per-class prior rows at bucket = −1 — the trained language-ID
    * shape (fastText's actual job), generalizing the binary gate to
    * argmax over any label set. Same fixed-point quantization, so
    * prediction is exact integer arithmetic; per-class weights are
    * log P(bucket|class), priors log P(class) (softmax-monotone, and
    * only the argmax is consumed). `labels`: (idCol, y: String).
    *
    * Scale shape: one (bucket, class) aggregation over seed features;
    * the dense grid is range(dim) × the class table (both bounded);
    * output dim·|classes| + |classes| rows — broadcast-sized. */
  def nbTrainMulti(df: DataFrame, idCol: String, textCol: String,
                   labels: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = df.sparkSession
    val lab = labels.select(col(idCol), col("y").cast("string").as("y"))
    val f = hashedFeatures(df, idCol, textCol, dim).join(lab, Seq(idCol))
    val perBC = f.groupBy(col("bucket"), col("y"))
      .agg(sum(col("cnt")).as("__c"))
    val dense = spark.range(dim).select(col("id").as("bucket"))
      .crossJoin(lab.select(col("y")).distinct())
      .join(broadcast(perBC), Seq("bucket", "y"), "left")
      .select(col("bucket"), col("y"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = dense.groupBy(col("y")).agg(sum(col("__c")).as("__t"))
    val prior = lab.groupBy(col("y")).agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(lab.agg(count(lit(1)).as("__all"))))
    dense.join(broadcast(tot), Seq("y"))
      .select(col("bucket"), col("y"),
        round(lit(10000) * log((col("__c") + 1.0) / (col("__t") + dim)), 0)
          .cast("long").as("w"))
      .unionByName(prior.select(lit(-1L).as("bucket"), col("y"),
        round(lit(10000) * log(col("__n") / col("__all").cast("double")), 0)
          .cast("long").as("w")))
  }

  /** Multiclass prediction: argmax over per-class integer scores,
    * ties to the lexicographically smallest class (min over
    * (−score, y) structs — deterministic across engines and
    * partitionings). NULL text coalesces to "" before featurizing, so
    * every input document gets exactly one output row — a null-text
    * doc scores as the single empty token plus the class bias.
    * Output: (idCol, pred, score). */
  def nbPredictMulti(df: DataFrame, idCol: String, textCol: String,
                     weights: DataFrame, dim: Int): DataFrame = {
    val w = weights.filter(col("bucket") >= 0)
    val pri = weights.filter(col("bucket") === -1)
      .select(col("y"), col("w").as("__bias"))
    hashedFeatures(df.withColumn(textCol, coalesce(col(textCol), lit(""))),
        idCol, textCol, dim)
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol), col("y"))
      .agg(sum(col("cnt") * col("w")).as("__s"))
      .join(broadcast(pri), Seq("y"))
      .select(col(idCol), col("y"), (col("__s") + col("__bias")).as("__sc"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__sc")).as("ns"), col("y"))).as("__m"))
      .select(col(idCol), col("__m").getField("y").as("pred"),
        (-col("__m").getField("ns")).as("score"))
  }

  /** Naive-Bayes gate: score every document with a [[nbTrain]] weight
    * table — score = bias + Σ cnt_b · w_b, pred = score ≥ 0 (the
    * binary NB decision function; absent buckets contribute nothing
    * on either class, so present-bucket terms are the whole
    * difference). Exact integer arithmetic end to end. NULL text
    * coalesces to "" before featurizing, so "score every document"
    * holds literally — a null-text doc scores as the single empty
    * token plus the bias instead of vanishing from the output.
    *
    * Scale shape: the weight table is dim + 1 rows and broadcasts;
    * the per-doc fold is [[linearScoreGate]]'s one exchange. Output:
    * (idCol, score, pred). */
  def nbGate(df: DataFrame, idCol: String, textCol: String,
             weights: DataFrame, dim: Int): DataFrame = {
    val w = weights.filter(col("bucket") >= 0)
    val bias = weights.filter(col("bucket") === -1)
      .select(col("w").as("__bias"))
    hashedFeatures(df.withColumn(textCol, coalesce(col(textCol), lit(""))),
        idCol, textCol, dim)
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("cnt") * col("w")).as("__s"))
      .crossJoin(broadcast(bias))
      .select(col(idCol), (col("__s") + col("__bias")).as("score"),
        (col("__s") + col("__bias") >= 0L).as("pred"))
  }

  /** Robust per-key outlier gate: deviation from the key's MEDIAN,
    * measured in MADs (median absolute deviations) — the gate that
    * survives its own outliers. [[zScoreGatePerKey]]'s mean/stddev
    * baseline is dragged toward the very anomalies it is hunting
    * (one 1000× spike inflates σ enough to hide ten 10× spikes);
    * median and MAD have 50% breakdown, so the baseline stands
    * still (spec-pinned head-to-head in CurationSpec).
    *
    * Scale shape: two key-sized aggregation passes (median, then the
    * MAD over deviations) joined back AQE-broadcast; the exact
    * `percentile` is the oracle-parity choice — at true scale swap
    * `approx_percentile`, the same pinned substitute q33 documents.
    * Output: (keyCol, idCol, valueCol, dev rounded 4, pass). */
  def madGatePerKey(df: DataFrame, keyCol: String, idCol: String,
                    valueCol: String, nMads: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valueCol, 0.5D)").as("__med"))
    val withMed = df.join(med, Seq(keyCol))
    val mad = withMed
      .groupBy(col(keyCol))
      .agg(expr(s"percentile(abs($valueCol - __med), 0.5D)").as("__mad"))
    withMed.join(mad, Seq(keyCol))
      .select(col(keyCol), col(idCol), col(valueCol),
        (round(abs(col(valueCol) - col("__med")), 4) + lit(0.0)).as("dev"),
        (abs(col(valueCol) - col("__med")) <= lit(nMads) * col("__mad"))
          .as("pass"))
  }

  /** Quality-aware keep-one rooting: re-root each dup group at its
    * BEST-scoring member (ties → smallest id) instead of the
    * smallest-id default [[Dedup.connectedComponents]] emits. When
    * near-dups differ — one copy truncated, one ad-injected, one
    * clean — "keep the first we crawled" throws quality away; this
    * keeps the copy a score column (token count, quality gate score,
    * source priority) ranks highest. Input: `groups` (id, keep_id)
    * label table, `scores` (idCol, score). Output: (id, keep_id) with
    * keep_id = argmax-score member — drop-in for [[keepOne]].
    *
    * Scale shape: one agg over the label table joined with scores
    * (min_by over a (−score, id) struct — deterministic, map-side
    * combined), producing a group-count-sized rep table joined back on
    * the group key; AQE broadcasts it when small. The corpus itself is
    * never touched — like [[incrementalCurationDelta]], cost is
    * O(labels). */
  def keepBest(groups: DataFrame, scores: DataFrame, idCol: String): DataFrame = {
    val sc = scores.select(col(idCol).as("id"), col("score"))
    val best = groups.join(sc, Seq("id"))
      .groupBy(col("keep_id").as("g"))
      .agg(min_by(col("id"), struct((-col("score")).as("s"), col("id"))).as("best_id"))
    groups.join(best, groups("keep_id") === best("g"))
      .select(col("id"), col("best_id").as("keep_id"))
  }

  /** Fixed-size training windows: split each document's token stream
    * into chunks of `window` tokens starting every `stride` tokens
    * (stride < window ⇒ overlapping context windows; stride = window
    * ⇒ disjoint packing grains). The tail chunk may be short; every
    * token appears in ≥1 chunk. Output: (id, chunk_idx, n_tokens,
    * chunk_text), chunk_idx 0-based in token order.
    *
    * Scale shape: pure narrow projection + generator — zero
    * exchanges, whole-stage codegen end-to-end; chunk indices derive
    * from token positions, not a window function, so no sort and no
    * per-document state. Output size is ×(window/stride) the corpus —
    * the caller picks the overlap it can afford. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0,
      s"window/stride must be positive, got $window/$stride")
    require(stride <= window,
      s"stride ($stride) > window ($window) would drop the tokens between " +
        "them from every chunk, breaking the every-token-covered contract")
    val toks = split(col(textCol), " ")
    df.select(col(idCol), posexplode(
        transform(
          sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
          start => slice(toks, start + 1, lit(window))))
        .as(Seq("chunk_idx", "__w")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("__w")).cast("long").as("n_tokens"),
        array_join(col("__w"), " ").as("chunk_text"))
  }

  /** Frequency-ranked vocabulary over the corpus: the `maxSize` most
    * frequent tokens, ids 0-based by (count desc, token asc) so the
    * table is reproducible run-to-run with no RNG and no
    * driver-ordering dependence. Output: (token, id, cnt).
    *
    * Scale shape: one map-side-combined count agg, then a DISTRIBUTED
    * top-maxSize (TakeOrdered — each partition contributes ≤ maxSize
    * candidates) so the full Heaps-law token-type table is never
    * globally sorted; only the ≤ maxSize survivors pass through the
    * single-partition rank window. */
  def buildVocab(df: DataFrame, textCol: String, maxSize: Int): DataFrame =
    vocabFromCounts(tokenCounts(df, textCol), maxSize)

  /** The corpus token-frequency table: (token, cnt) — one map-side-
    * combined agg. The unit of incremental vocabulary maintenance:
    * counts from disjoint corpus slices ADD ([[mergeTokenCounts]]),
    * so a batch ingest never re-tokenizes history. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))

  /** Fold a new batch's token counts into the standing table: union +
    * sum on the token key. Counts over disjoint doc sets are additive,
    * so merged counts == from-scratch counts exactly (the q86
    * invariant) — and therefore the RANKING is identical too. */
  def mergeTokenCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))

  /** Rank a (token, cnt) table into the id-assigned vocabulary —
    * distributed top-maxSize first (TakeOrdered), then the bounded
    * rank window (see [[buildVocab]]'s scaladoc). */
  def vocabFromCounts(counts: DataFrame, maxSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .orderBy(col("cnt").desc, col("token").asc).limit(maxSize)
      .withColumn("id", (row_number().over(
        Window.orderBy(col("cnt").desc, col("token").asc)) - 1).cast("long"))
  }

  /** Tokenize documents against a [[buildVocab]] table: map each token
    * to its vocabulary id (`oovId` when absent) and reassemble the id
    * sequence in token order. Output: (id, n_tok, n_oov, ids) with
    * `ids` the comma-joined id sequence — the corpus-to-token-ids step
    * a training pipeline runs last, plus the OOV-rate column used to
    * size the vocabulary.
    *
    * Scale shape: the vocabulary is maxSize-bounded and broadcast, so
    * the corpus never shuffles for the lookup; the one exchange is the
    * per-document reassembly agg, which carries ids (8 bytes/token),
    * not text. Order is restored by sorting the collected (pos, id)
    * structs per document — no global sort, no window function. */
  def tokenizeToIds(df: DataFrame, idCol: String, textCol: String,
                    vocab: DataFrame, oovId: Long = -1L): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .select(col(idCol), col("pos"), coalesce(col("id"), lit(oovId)).as("id"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("id") === oovId, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          x => x.getField("id").cast("string"))).as("ids"))

  /** The complete curation delta of one ingest batch — what changed
    * in keep-one terms when [[Dedup.incrementalComponents]] folded the
    * batch's pairs into the label table:
    *
    *  - `new_keep`: batch docs that entered a group as its keeper
    *    (their id is the component minimum),
    *  - `new_drop`: batch docs that joined a group someone else keeps,
    *  - `displaced`: PRIOR keepers whose crown moved — a batch doc
    *    with a smaller id joined their component, or the batch bridged
    *    two old components; these docs were kept yesterday and must be
    *    dropped today, the delta a naive "only look at new docs" diff
    *    misses.
    *
    * `isNewId` marks batch membership (same predicate the candidate
    * generation used). Scope is the label universe: a batch doc with
    * no duplicate pair appears in neither table and is trivially kept.
    * Both inputs are label tables keyed (id, keep_id); the comparisons
    * are one join between them — no corpus contact at all, so the
    * delta costs O(labels), not O(corpus). */
  def incrementalCurationDelta(oldLabels: DataFrame, newLabels: DataFrame,
                               isNewId: Column): DataFrame = {
    val newDocs = newLabels.filter(isNewId)
    val newKeep = newDocs.filter(col("keep_id") === col("id"))
      .select(col("id").as("doc_id"), lit("new_keep").as("status"))
    val newDrop = newDocs.filter(col("keep_id") =!= col("id"))
      .select(col("id").as("doc_id"), lit("new_drop").as("status"))
    val displaced = oldLabels.filter(col("keep_id") === col("id")).select(col("id"))
      .join(newLabels.filter(col("keep_id") =!= col("id")).select(col("id")),
        Seq("id"))
      .select(col("id").as("doc_id"), lit("displaced").as("status"))
    newKeep.union(newDrop).union(displaced)
  }

  /** Deterministic epoch shuffle — the training-order permutation a
    * data loader consumes: for each epoch, every key gets a
    * pseudorandom-but-reproducible global rank (salted md5 order, the
    * [[hashFraction]] determinism idiom), so "shuffle each epoch
    * differently" is a pure function of (key, epoch) with no RNG
    * state, identical across engines, partitionings and reruns.
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY epoch)`
    * would sort each epoch's ENTIRE corpus on one reducer. Instead the
    * rank is two-phase (the [[capPerSourceScalable]] /
    * [[Packing.packByBudget]] prefix-sum idiom): the leading md5 byte
    * range-buckets each epoch into 256 uniform buckets (a hash prefix
    * preserves hash order), per-(epoch, bucket) counts — a tiny
    * aggregate — prefix-sum into bucket offsets, and the global rank
    * is offset + local rank within the (epoch, bucket) partition. The
    * corpus-sized sort is 256-way parallel per epoch; the offset
    * table (epochs × 256 rows) broadcasts.
    *
    * Output: (epoch, ord, idCol) — ord is 1-based and dense within
    * each epoch. */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
                   salt: String = "ep"): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val keyed = df.select(col(idCol)).distinct()
      .select(col(idCol),
        explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .withColumn("__hk", md5(concat_ws("|",
        col(idCol).cast("string"), lit(salt), col("epoch").cast("string"))))
      .withColumn("__b", conv(substring(col("__hk"), 1, 2), 16, 10)
        .cast("long"))
    val offsets = keyed.groupBy(col("epoch"), col("__b"))
      .agg(count(lit(1)).as("__cn"))
      .withColumn("__off", coalesce(sum(col("__cn")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("epoch"))
          .orderBy(col("__b"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("epoch"), col("__b"), col("__off"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("__b"))
      .orderBy(col("__hk"), col(idCol))
    keyed.join(broadcast(offsets), Seq("epoch", "__b"))
      .select(col("epoch"),
        (col("__off") + row_number().over(wLocal)).cast("long").as("ord"),
        col(idCol))
  }

  /** INCREMENTAL [[epochShuffle]] maintenance — the loader-order twin
    * of the append-only ingest story (appendSealedShards only ADDS
    * (shard, seq) keys, so the landed permutation stays valid and the
    * batch's keys must be WOVEN IN at exactly the ranks a from-scratch
    * shuffle would give them). The salted-hash rank decomposes as
    * bucket offset + within-bucket rank, and a new key only shifts an
    * old key's rank by the count of new hashes below it — so:
    *
    *  - the batch hashes into per-(epoch, bucket) sorted arrays and
    *    counts (batch-bounded, broadcast);
    *  - OLD keys update in one broadcast-joined streaming projection:
    *    ord += new keys in lower buckets + new same-bucket hashes
    *    below (a filtered-array size over the broadcast batch) — no
    *    re-rank, no corpus shuffle, no window over the landed table;
    *  - NEW keys rank as old-below + new-below (the old-below count
    *    aggregates only over old rows in batch-TOUCHED buckets).
    *
    * Work ∝ batch plus streaming scans of the landed table — the
    * [[graft.operators.Dedup.incrementalComponents]] discipline.
    * Reproduces `epochShuffle(old ∪ batch)` verbatim (md5 ties across
    * distinct keys are the only divergence and cannot occur).
    * `landed` is a prior epochShuffle/incremental output
    * (epoch, ord, idCol); `batch` is one id column, disjoint from it.
    * Output: the updated (epoch, ord, idCol). */
  def epochShuffleIncremental(landed: DataFrame, batch: DataFrame,
                              idCol: String, epochs: Int,
                              salt: String = "ep"): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = landed.sparkSession
    def hashed(df: DataFrame) = df
      .withColumn("__hk", md5(concat_ws("|",
        col(idCol).cast("string"), lit(salt), col("epoch").cast("string"))))
      .withColumn("__b", conv(substring(col("__hk"), 1, 2), 16, 10)
        .cast("long"))
    val oldK = hashed(landed.select(col("epoch"), col("ord"), col(idCol)))
    val newK = hashed(batch.select(col(idCol)).distinct()
        .select(col(idCol),
          explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch")))
      .localCheckpoint(true) // batch-sized; consumed by several joins
    val newBuckets = newK.groupBy(col("epoch"), col("__b"))
      .agg(sort_array(collect_list(col("__hk"))).as("__arr"),
        count(lit(1)).as("__cn"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch")).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val slots = spark.range(epochs).toDF("epoch")
      .crossJoin(spark.range(256).toDF("__b"))
    val bucketTab = slots.join(newBuckets, Seq("epoch", "__b"), "left")
      .withColumn("__doff", coalesce(sum(col("__cn")).over(wOff), lit(0L)))
      .withColumn("__arr",
        coalesce(col("__arr"), array().cast("array<string>")))
      .select(col("epoch"), col("__b"), col("__doff"), col("__arr"))
    val oldOut = oldK.join(broadcast(bucketTab), Seq("epoch", "__b"))
      .select(col("epoch"),
        (col("ord") + col("__doff") +
          size(filter(col("__arr"), x => x < col("__hk"))).cast("long"))
          .as("ord"),
        col(idCol))
    val oldOffTab = slots
      .join(oldK.groupBy(col("epoch"), col("__b"))
        .agg(count(lit(1)).as("__ocn")), Seq("epoch", "__b"), "left")
      .withColumn("__ooff", coalesce(sum(col("__ocn")).over(wOff), lit(0L)))
      .select(col("epoch"), col("__b"), col("__ooff"))
    val obib = oldK
      .join(broadcast(newBuckets.select(col("epoch"), col("__b"))),
        Seq("epoch", "__b"), "left_semi")
      .join(broadcast(newK.select(col("epoch"), col("__b"),
        col(idCol).as("__nid"), col("__hk").as("__nhk"))),
        Seq("epoch", "__b"))
      .filter(col("__hk") < col("__nhk"))
      .groupBy(col("epoch"), col("__nid").as(idCol))
      .agg(count(lit(1)).as("__obib"))
    val wNewLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("__b"))
      .orderBy(col("__hk"), col(idCol))
    val newOut = newK
      .join(broadcast(bucketTab.select(col("epoch"), col("__b"),
        col("__doff"))), Seq("epoch", "__b"))
      .join(broadcast(oldOffTab), Seq("epoch", "__b"))
      .withColumn("__nbib", row_number().over(wNewLocal).cast("long") - 1L)
      .join(obib, Seq("epoch", idCol), "left")
      .select(col("epoch"),
        (col("__ooff") + coalesce(col("__obib"), lit(0L)) +
          col("__doff") + col("__nbib") + 1L).as("ord"),
        col(idCol))
    oldOut.unionByName(newOut)
  }

  /** Token-budget mixture planner — the table a pipeline operator
    * reads before launching a training run: given a total token
    * budget and a sampling temperature `alpha` (Raffel et al. 2020 /
    * multilingual-LM mixing: sample source s with probability
    * ∝ p_s^alpha, alpha = 1 natural, alpha = 0 uniform), the
    * per-source epoch factor budget·q_s / tokens_s — how many times
    * the source is traversed — and its expected token contribution.
    * The epochs column is exactly what [[mixBySource]] consumes as a
    * weight to materialize the plan.
    *
    * Fully declarative (no driver-side collect, unlike
    * [[temperatureWeights]]' bounded map): totals are broadcast
    * one-row aggregates, so the whole plan is one #sources-sized
    * aggregate plus projections.
    *
    * Output: (sourceCol, n_docs, n_tokens, q, epochs, est_tokens),
    * q = normalized sampling probability rounded 4. */
  def tokenBudgetPlan(df: DataFrame, textCol: String, sourceCol: String,
                      budget: Long, alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val src = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " "))).cast("long").as("n_tokens"))
    val tot = src.agg(sum(col("n_tokens")).cast("double").as("__tot"))
    val pa = src.crossJoin(broadcast(tot))
      .withColumn("__pa", pow(col("n_tokens") / col("__tot"), alpha))
    val z = pa.agg(sum(col("__pa")).as("__z"))
    pa.crossJoin(broadcast(z))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("__pa") / col("__z"), 4).as("q"),
        round(lit(budget) * col("__pa") / col("__z") / col("n_tokens"), 4)
          .as("epochs"),
        round(lit(budget) * col("__pa") / col("__z"), 0).cast("long")
          .as("est_tokens"))
  }

  /** First URL host in the text ('' when none) — the key every
    * crawl-pipeline domain rule (blocklists, per-domain caps, domain
    * mixing) operates on. */
  def extractDomain(text: Column): Column =
    regexp_extract(text, "https?://([^/ ]+)", 1)

  /** Domain blocklist filter: each document with its extracted
    * domain and its blocklist verdict — the URL-level cut every
    * crawl pipeline applies before any content rule runs (the
    * blocklist is curated metadata, tiny, effectively broadcast
    * as a literal predicate). Output: (idCol, domain, blocked). */
  def domainFilter(df: DataFrame, idCol: String, textCol: String,
                   blocked: Seq[String]): DataFrame =
    df.select(col(idCol), extractDomain(col(textCol)).as("domain"))
      .withColumn("blocked",
        if (blocked.isEmpty) lit(false)
        else col("domain").isin(blocked.map(lit(_)): _*))

  /** Jensen–Shannon divergence between the hashed-token distributions
    * of two corpus slices (old vs `isNew`) — the domain-shift monitor
    * an ingest owner reads after every batch: JS ≈ 0 means the new
    * data speaks the corpus's language; a jump means a new domain (or
    * a scraper gone wrong) arrived. Features are the [[hashedFeatures]]
    * md5 buckets, so the distribution is `dim`-dimensional regardless
    * of vocabulary size.
    *
    * Determinism: each bucket's JS contribution is quantized to a
    * 1e-6 fixed-point integer BEFORE summing (the [[nbTrain]] idiom),
    * so the cross-partition sum is exact integer arithmetic — no
    * float-addition-order sensitivity — and the expression tree
    * (0.5·p·ln(p/m), left to right) matches the oracle's shape
    * operation for operation.
    *
    * Scale shape: one token-explode pass folded map-side into dim
    * rows; everything after is arithmetic over the tiny bucket table
    * with broadcast one-row totals.
    *
    * Output: one row (n_old, n_new, js). */
  def tokenJsDivergence(df: DataFrame, textCol: String, isNew: Column,
                        dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val counts = df
      .select(explode(split(col(textCol), " ")).as("token"),
        isNew.cast("int").as("__nw"))
      .select(
        (conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") % dim)
          .as("bucket"), col("__nw"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__nw") === 0, 1L).otherwise(0L)).as("c_old"),
        sum(col("__nw").cast("long")).as("c_new"))
    jsTail(counts)
  }

  /** The hashed-bucket token profile of a corpus slice: (bucket, cnt),
    * `dim` rows — the mergeable, savable artifact a deployment
    * freezes as its reference distribution (counts over disjoint row
    * sets add, the [[Similarity.centroidSums]] idiom). */
  def bucketProfile(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(explode(split(col(textCol), " ")).as("token"))
      .select(
        (conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long") % dim)
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[tokenJsDivergence]] between two prebuilt [[bucketProfile]]s —
    * the form a streaming monitor uses: the reference profile is a
    * frozen artifact, each arriving batch profiles itself and
    * compares. Buckets absent from one side contribute their
    * one-sided term (full outer join, zero fill). */
  def jsShift(ref: DataFrame, cur: DataFrame): DataFrame =
    jsTail(ref.select(col("bucket"), col("cnt").as("c_old"))
      .join(cur.select(col("bucket"), col("cnt").as("c_new")),
        Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new")))

  /** The fixed-point JS arithmetic over a (bucket, c_old, c_new)
    * table — see [[tokenJsDivergence]] for the determinism contract.
    * A degenerate profile (either side's total is zero — an empty
    * reference artifact, or a batch whose tokens all hash to the
    * other side) has no JS divergence; dividing through would yield a
    * silent null `js` that a downstream `js > τ` alert never fires
    * on, so the guard fails LOUDLY instead (`raise_error` on the
    * result row — declarative, fires only when the bad row would
    * actually be produced). */
  private def jsTail(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("c_old")).cast("double").as("t_old"),
      sum(col("c_new")).cast("double").as("t_new"))
    // zero-total-safe divisions: on a healthy profile the `when`
    // resolves to the identical division (oracle arithmetic parity
    // intact); on a degenerate one they keep ANSI mode from throwing
    // a bare DIVIDE_BY_ZERO out of the term math so the row reaches
    // the labelled raise_error below.
    val p = when(col("t_old") > 0, col("c_old") / col("t_old")).otherwise(0.0)
    val q = when(col("t_new") > 0, col("c_new") / col("t_new")).otherwise(0.0)
    val m = (p + q) / 2
    counts.crossJoin(broadcast(tot))
      .select(col("t_old"), col("t_new"),
        round(lit(1000000) * (
          when(col("c_old") > 0, lit(0.5) * p * log(p / m)).otherwise(0.0) +
          when(col("c_new") > 0, lit(0.5) * q * log(q / m)).otherwise(0.0)))
          .cast("long").as("__term"))
      .groupBy(col("t_old"), col("t_new"))
      .agg(sum(col("__term")).as("__js"))
      .select(col("t_old").cast("long").as("n_old"),
        col("t_new").cast("long").as("n_new"),
        when(col("t_old") <= 0.0 || col("t_new") <= 0.0 ||
            isnull(col("t_old")) || isnull(col("t_new")),
          raise_error(concat(lit("degenerate JS profile: t_old="),
            col("t_old").cast("string"), lit(", t_new="),
            col("t_new").cast("string"),
            lit(" (both sides need tokens)"))).cast("double"))
          .otherwise(round(col("__js") / 1000000.0, 4)).as("js"))
  }

  /** C4-style line filtering (Raffel et al. 2020 §2.2): keep only
    * lines that end in terminal punctuation, have at least `minWords`
    * words, and contain no code-ish `{` — the sentence-level cleanup
    * pass that runs before any document-level gate. Output:
    * (idCol, clean, n_kept, n_dropped); a document whose every line
    * fails comes out with empty `clean` (the keep-then-filter shape —
    * downstream length gates drop it).
    *
    * Scale shape: pure per-row projection over the line array
    * (higher-order `filter`, codegen, no explode, no shuffle). */
  /** Fill-in-the-middle transformation (Bavarian et al. 2022, PSM
    * mode): each document splits at two DETERMINISTIC points (hashed
    * from the id — reproducible across runs and engines, no RNG) into
    * prefix/middle/suffix, re-emitted as
    * `<PRE> prefix <SUF> suffix <MID> middle` so an autoregressive
    * model learns infilling from plain next-token prediction. The
    * split points are uniform over word boundaries; empty segments
    * are legal (the edge cases a FIM loader must tolerate).
    *
    * Scale shape: a pure per-row projection — codegen, no explode, no
    * shuffle. Output: (idCol, n_prefix, n_middle, n_suffix, fim). */
  def fimTransform(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val n = size(w)
    def cut(salt: String) =
      (conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))),
        1, 8), 16, 10).cast("long") % (n + 1).cast("long")).cast("int")
    val lo = least(cut("|fim1"), cut("|fim2"))
    val hi = greatest(cut("|fim1"), cut("|fim2"))
    df.select(col(idCol),
      lo.cast("long").as("n_prefix"),
      (hi - lo).cast("long").as("n_middle"),
      (n - hi).cast("long").as("n_suffix"),
      concat_ws(" ", concat(
        array(lit("<PRE>")), slice(w, lit(1), lo),
        array(lit("<SUF>")), slice(w, hi + 1, n - hi),
        array(lit("<MID>")), slice(w, lo + 1, hi - lo))).as("fim"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): word
    * positions are grouped into fixed windows (`window` — the mean
    * corrupted-span length) and each window masks with probability
    * `pct`/100, decided by a DETERMINISTIC hash of (id, window) —
    * reproducible, engine-portable, and self-contained per row.
    * Adjacent masked windows merge into one span; span k is replaced
    * by the sentinel `<X{k}>` in the inputs and introduces its
    * original words in the targets — the (inputs, targets) pair a
    * denoising trainer consumes.
    *
    * Scale shape: one explode to word grain, windows/islands as
    * per-document window functions (bounded partitions), one
    * per-document fold back. Output: (idCol, n_masked, inputs,
    * targets). */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  window: Int = 3, pct: Int = 15): DataFrame = {
    require(window >= 1 && pct >= 0 && pct <= 100,
      s"window must be >= 1 and pct in [0,100], got $window/$pct")
    val words = df.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .withColumn("__win", (col("pos") / window).cast("long"))
      .withColumn("__masked",
        conv(substring(md5(concat(col(idCol).cast("string"), lit("|sc|"),
          col("__win"))), 1, 8), 16, 10).cast("long") % 100 < pct)
    // masked islands: consecutive masked WINDOWS merge into one span;
    // span index k = rank of the island within the document
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__win"))
    val spans = words.filter(col("__masked"))
      .select(col(idCol), col("__win")).distinct()
      .withColumn("__isl", col("__win") - row_number().over(wWin))
    val islands = spans.groupBy(col(idCol), col("__isl"))
      .agg(min(col("__win")).as("__w0"))
      .withColumn("__k", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col(idCol)).orderBy(col("__w0"))) - 1)
      .select(col(idCol), col("__isl"), col("__k"))
    val tagged = words
      .join(spans.select(col(idCol), col("__win"), col("__isl")),
        Seq(idCol, "__win"), "left")
      .join(islands, Seq(idCol, "__isl"), "left")
      .withColumn("__p0", min(when(col("__masked"), col("pos")))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol), col("__isl"))))
      .withColumn("__spanStart", col("__masked") && col("pos") === col("__p0"))
    // inputs: unmasked words verbatim; the FIRST word of a masked
    // span becomes its sentinel; other masked words drop
    val inputs = tagged
      .filter(!col("__masked") || col("__spanStart"))
      .groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"),
          when(col("__masked"), concat(lit("<X"), col("__k"), lit(">")))
            .otherwise(col("w")).as("t")))),
        x => x.getField("t"))).as("inputs"))
    // targets: each span's sentinel followed by its original words
    val targets = tagged.filter(col("__masked"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_masked"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"),
            when(col("__spanStart"),
              concat(lit("<X"), col("__k"), lit("> "), col("w")))
              .otherwise(col("w")).as("t")))),
          x => x.getField("t"))).as("targets"))
    df.select(col(idCol))
      .join(inputs, Seq(idCol), "left")
      .join(targets, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("inputs"), lit("")).as("inputs"),
        coalesce(col("targets"), lit("")).as("targets"))
  }

  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 5): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keep = (l: Column) =>
      size(split(l, " ")) >= minWords && l.rlike("[.!?]$") &&
        !l.contains("{")
    val kept = filter(lines, keep)
    df.select(col(idCol),
      array_join(kept, "\n").as("clean"),
      size(kept).cast("long").as("n_kept"),
      (size(lines) - size(kept)).cast("long").as("n_dropped"))
  }
}
