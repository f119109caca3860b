package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string joins (record linkage / entity resolution):
  * match each left record to its closest right record by edit
  * distance WITHOUT the all-pairs cross join — the "dirty catalog vs
  * canonical catalog" problem (misspelled product names, OCR'd
  * titles, crawl-variant page titles feeding a dedup decision).
  *
  * Scale shape: candidates come from an INVERTED-INDEX equi-join on
  * shared tokens — only pairs sharing at least one token are ever
  * scored, the standard blocking step that makes fuzzy joins
  * tractable (a typo leaves most tokens intact, so recall holds for
  * small edit distances on multi-token strings; a single-token string
  * that mutates its only token is invisible to ANY blocking scheme
  * short of n-gram blocking). Stop-tokens are dropped by a document-
  * frequency cap exactly like the banded-LSH hot-bucket cap: a token
  * in half the catalog generates quadratic candidate mass and carries
  * no discriminating signal. Scoring is the codegen'd `levenshtein`
  * on just the candidates; the per-left argmin is one `min(struct)`
  * aggregation — tie-broken by right id, no window.
  */
object FuzzyJoin {

  /** Best right-side match per left row. Inputs are (id, text) pairs
    * on each side; output is one row per MATCHED left row:
    * (leftId, leftText, rightId, rightText, dist). Left rows sharing
    * no sub-cap token with any right row have no candidates and drop
    * out (they'd need n-gram blocking — a recall/cost knob this
    * operator keeps explicit rather than silently paying).
    *
    * `maxTokenDf` is the stop-token cap: tokens present in more than
    * this many right rows generate no candidates. `maxDist` drops
    * scored pairs above the threshold BEFORE the argmin, so a left
    * row whose best candidate is still a bad match returns nothing
    * instead of a misleading "closest garbage". */
  def tokenBlockedBestMatch(left: DataFrame, leftId: String,
                            leftText: String,
                            right: DataFrame, rightId: String,
                            rightText: String,
                            maxTokenDf: Long,
                            maxDist: Int = Int.MaxValue): DataFrame = {
    val lt = left.select(col(leftId).as("__lid"), col(leftText).as("__ltext"))
    val rt = right.select(col(rightId).as("__rid"), col(rightText).as("__rtext"))
    val rtok = rt
      .select(col("__rid"), explode(split(col("__rtext"), " ")).as("__tok"))
      .distinct()
    // document frequency over the RIGHT catalog; the cap kills
    // stop-tokens before they can fan out candidates
    val keep = rtok.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTokenDf)
      .select(col("__tok"))
    val ltok = lt
      .select(col("__lid"), explode(split(col("__ltext"), " ")).as("__tok"))
      .distinct()
    val cand = ltok
      .join(keep, Seq("__tok"))
      .join(rtok, Seq("__tok"))
      .select(col("__lid"), col("__rid"))
      .distinct()
    val scored = cand
      .join(lt, Seq("__lid"))
      .join(rt, Seq("__rid"))
      .withColumn("__dist", levenshtein(col("__ltext"), col("__rtext")))
      .filter(col("__dist") <= maxDist)
    // argmin by (dist, rid): struct ordering is lexicographic and rid
    // is unique, so the winner is tie-free without a window
    scored
      .groupBy(col("__lid"), col("__ltext"))
      .agg(min(struct(col("__dist"), col("__rid"), col("__rtext"))).as("__b"))
      .select(col("__lid").as(leftId), col("__ltext").as(leftText),
        col("__b.__rid").as(rightId), col("__b.__rtext").as(rightText),
        col("__b.__dist").cast("long").as("dist"))
  }

  /** EXACT Jaccard-threshold set-similarity self-join via prefix
    * filtering (the PPJoin candidate rule) — every pair with token-set
    * Jaccard ≥ `thresholdPct`/100, guaranteed complete, without the
    * all-pairs join and without MinHash's false negatives.
    *
    * The rule: order each set's tokens by global rarity (document
    * frequency asc, token asc) and keep only the PREFIX of length
    * n − ⌈t·n⌉ + 1. J(a,b) ≥ t implies |a∩b| ≥ ⌈t·|a|⌉ (the union is
    * at least |a|), and a pair sharing no prefix token of `a` can
    * share at most ⌈t·|a|⌉ − 1 tokens — contradiction, so candidates
    * from a prefix-token equi-join are COMPLETE. Survivors get their
    * exact overlap counted and the integer-exact test
    * `ov·100 ≥ un·thresholdPct` — no doubles anywhere.
    *
    * Scale shape: the candidate join fans out per token as prefix-df²
    * — and a globally hot token ranks LAST by rarity, so it falls out
    * of every large set's prefix; the quadratic mass that kills a
    * naive shared-token join is excluded by construction rather than
    * capped (this operator trades the LSH family's hot-bucket cap for
    * an exactness guarantee). Input: a DISTINCT (id, token) set table.
    * Output: (id_a, id_b, ov, un), qualifying pairs only. */
  def jaccardJoinPrefix(tokens: DataFrame, idCol: String, tokCol: String,
                        thresholdPct: Int): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100)
    val dt = tokens.select(col(idCol).as("__id"), col(tokCol).as("__tok"))
    val sizes = dt.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val dfreq = dt.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__df"), col("__tok"))
    val prefix = dt.join(dfreq, Seq("__tok"))
      .withColumn("__rk", row_number().over(wRank))
      .join(sizes, Seq("__id"))
      .filter(col("__rk") <=
        col("__n") - expr(s"($thresholdPct * __n + 99) div 100") + 1)
      .select(col("__tok"), col("__id"))
    val cand = prefix.select(col("__tok"), col("__id").as("__ia"))
      .join(prefix.select(col("__tok"), col("__id").as("__ib")),
        Seq("__tok"))
      .filter(col("__ia") < col("__ib"))
      .select(col("__ia"), col("__ib")).distinct()
    val ov = cand
      .join(dt.select(col("__id").as("__ia"), col("__tok")), Seq("__ia"))
      .join(dt.select(col("__id").as("__ib"), col("__tok")),
        Seq("__ib", "__tok"))
      .groupBy(col("__ia"), col("__ib")).agg(count(lit(1)).as("ov"))
    ov.join(sizes.select(col("__id").as("__ia"), col("__n").as("__na")),
        Seq("__ia"))
      .join(sizes.select(col("__id").as("__ib"), col("__n").as("__nb")),
        Seq("__ib"))
      .withColumn("un", col("__na") + col("__nb") - col("ov"))
      .filter(col("ov") * 100 >= col("un") * thresholdPct)
      .select(col("__ia").as("id_a"), col("__ib").as("id_b"),
        col("ov"), col("un"))
  }
}
