package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, each designed
  * for the 100 TB regime:
  *
  *  - exact: one hash-shuffle on a 16-byte digest (never on the full
  *    text), map-side partial agg;
  *  - MinHash+LSH: per-doc signatures (narrow, embarrassingly
  *    parallel) → band-bucket self-join. The join key (band, sig) is
  *    high-cardinality, so the shuffle is well spread; candidate
  *    pairs — not all O(n²) pairs — are the only thing materialized;
  *  - n-gram Jaccard: exact verification joined only against LSH
  *    candidates;
  *  - SimHash: one narrow agg per (doc, bit), then a 64-row-per-doc
  *    rollup to a single long.
  */
object Dedup {

  /** Exact duplicate groups: digest → canonical (min) id + group size.
    * `dropDuplicates(textCol)` is the kept-rows view of the same op. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash band signatures.
    * numHashes salted-md5 min-hashes over `shingleN`-gram shingles,
    * banded `bandSize` at a time into a concatenated signature.
    * Output: (id, band, sig). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 8, bandSize: Int = 2,
                        shingleN: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val hashIds = spark.range(numHashes).select(col("id").as("j"))
    val sh = df.select(col(idCol), explode(shingles(col(textCol), shingleN)).as("shingle"))
    val mh = sh.crossJoin(broadcast(hashIds))
      .groupBy(col(idCol), col("j"))
      .agg(min(saltedMd5(col("j"), col("shingle"))).as("h"))
    val bandCols = (0 until bandSize).map(k =>
      min(when(col("j") % bandSize === k, col("h"))).as(s"h$k"))
    mh.groupBy(col(idCol), expr(s"j div $bandSize").as("band"))
      .agg(bandCols.head, bandCols.tail: _*)
      .select(col(idCol), col("band"),
        concat_ws("|", (0 until bandSize).map(k => col(s"h$k")): _*).as("sig"))
  }

  /** LSH candidate pairs: documents sharing any band signature.
    * Output: (id_a, id_b) with id_a < id_b, distinct. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String): DataFrame = {
    val a = sigs.select(col("band"), col("sig"), col(idCol).as("id_a"))
    val b = sigs.select(col("band"), col("sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity, computed only for `pairs`
    * (normally LSH candidates): |A∩B| / |A∪B| over distinct shingle
    * sets. Output: (id_a, id_b, jaccard rounded to 4). */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, shingleN: Int = 3): DataFrame = {
    val ds = df.select(col(idCol).as("sid"),
      explode(shingles(col(textCol), shingleN)).as("shingle")).distinct()
    val sizes = ds.groupBy(col("sid")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(ds.as("sa"), col("id_a") === col("sa.sid"))
      .join(ds.as("sb"), col("id_b") === col("sb.sid") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col("na.sid"))
      .join(sizes.as("nb"), col("id_b") === col("nb.sid"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("na.n_sh") + col("nb.n_sh") - col("inter")), 4)
          .as("jaccard"))
  }

  /** Per-document SimHash of `bits` bits (frequency-weighted token
    * votes; deterministic salted-md5 bit hashes). Output: (id, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val bitIds = spark.range(bits).select(col("id").as("b"))
    df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .crossJoin(broadcast(bitIds))
      .groupBy(col(idCol), col("b"))
      .agg(sum(simhashVote(col("b"), col("w"))).as("s"))
      .groupBy(col(idCol))
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .as("simhash"))
  }
}
