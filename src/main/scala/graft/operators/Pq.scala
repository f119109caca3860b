package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): vectors compress to `m`
  * small codes — one per subspace — and queries scan those codes with
  * ADC (asymmetric distance computation) lookup tables instead of
  * touching the float vectors.
  *
  * Where [[IvfIndex]] prunes WHICH vectors a query scans, PQ shrinks
  * WHAT a scan reads: m bytes per vector instead of dim floats — at
  * 100 TB of embeddings the codes table is ~64× smaller than the
  * corpus, usually small enough to cache in executor memory, and the
  * scan itself is m array lookups per pair instead of a dim-length
  * dot product. The two compose (IVF-PQ) by running this scan inside
  * each probed list.
  *
  * Codebooks here are deterministic SEED codebooks — the k corpus
  * vectors with the smallest md5(id) digests, sliced per subspace —
  * the same train-free, oracle-expressible discipline as
  * [[IvfIndex]]'s hash-stratified seeding (reproducible across runs,
  * no RNG, no Lloyd iterations). Real deployments swap in k-means
  * subspace codebooks; every downstream shape (encode projection, LUT
  * build, ADC scan) is codebook-agnostic.
  *
  * Scale shapes:
  *  - codebook: k×dim floats collected on the driver (k ≤ 256 —
  *    bounded, like IVF centroids) and unrolled into literal
  *    expressions, so encode/LUT are pure whole-stage-codegen
  *    projections — zero exchanges, no UDFs;
  *  - encode: narrow projection corpus → (id, codes[m]);
  *  - topK: queries carry their precomputed LUT (m×k doubles) through
  *    a broadcast, the corpus side reads only codes, and
  *    [[Similarity.topKPerKey]]'s partition-local heaps bound the
  *    rank exchange — the documented small-query-batch path, same as
  *    brute force, with IVF as the big-batch composition.
  */
object Pq {

  /** The k corpus vectors with the smallest md5(id || "|pq") digests,
    * in digest order — codeword c of subspace j is `slice j` of
    * row c. Distributed top-k (TakeOrdered), driver holds k×dim. */
  def seedCodebook(df: DataFrame, idCol: String, vecCol: String,
                   k: Int = 16): Array[Array[Float]] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(vecCol).as("v"),
        md5(concat(col(idCol).cast("string"), lit("|pq"))).as("__h"))
      .orderBy(col("__h").asc)
      .limit(k)
      .select(col("v")).as[Array[Float]].collect()
  }

  /** Squared L2 between subspace j of `vec` and subspace j of literal
    * codeword `w` — unrolled element terms, summed in ascending index
    * order (the oracle's list_sum order, so ties in the argmin agree
    * bit-for-bit). */
  private def subL2(vec: Column, w: Array[Float], j: Int, sub: Int): Column =
    (0 until sub).map { i =>
      val d = element_at(vec, j * sub + i + 1).cast("double") -
        lit(w(j * sub + i).toDouble)
      d * d
    }.reduce(_ + _)

  /** Encode each vector as m codes: codes[j] = argmin over codewords
    * of the subspace-j distance (ties → smallest codeword index, via
    * (d, c) struct ordering). Pure projection — the corpus never
    * shuffles to be encoded. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: Array[Array[Float]], m: Int): DataFrame = {
    val dim = codebook(0).length
    val sub = dim / m
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val codes = array((0 until m).map { j =>
      array_min(array(codebook.indices.map { c =>
        struct(subL2(col(vecCol), codebook(c), j, sub).as("d"),
          lit(c).as("c"))
      }: _*)).getField("c")
    }: _*)
    df.select(col(idCol), codes.as("codes"))
  }

  /** ADC top-k: each query precomputes lut[j][c] = subspace distance
    * to every codeword (one projection over the query batch), then the
    * joined distance is m lookups — Σ_j lut[j][codes[j]] — never a
    * dim-length loop. Output: (q_id, n_id, dist, rk), rk by
    * (dist asc, n_id asc), self-matches excluded.
    *
    * `codes` is an [[encode]] output; `queries` carries the original
    * vectors. The query side broadcasts (bounded batch — the
    * [[Similarity.bruteForceTopKScalable]] caveat applies). */
  def topK(codes: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, codebook: Array[Array[Float]], m: Int,
           k: Int): DataFrame = {
    val dim = codebook(0).length
    val sub = dim / m
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val lut = array((0 until m).map { j =>
      array(codebook.indices.map(c =>
        subL2(col(vecCol), codebook(c), j, sub)): _*)
    }: _*)
    val q = queries.select(col(idCol).as("q_id"), lut.as("__lut"))
    val dist = (0 until m).map { j =>
      element_at(element_at(col("__lut"), j + 1),
        element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    val scored = codes.select(col(idCol).as("n_id"), col("codes"))
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), (-round(dist, 4)).as("cos"))
    Similarity.topKPerKey(scored, k)
      .select(col("q_id"), col("n_id"), (-col("cos")).as("dist"), col("rk"))
  }
}
