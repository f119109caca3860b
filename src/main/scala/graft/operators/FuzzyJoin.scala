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
}
