package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *    bounded, like IVF centroids) and carried as a reference object
  *    in native kernel expressions ([[graft.functions.PqEncodeExpr]] /
  *    [[graft.functions.PqLutExpr]]), so encode/LUT stay whole-stage
  *    codegen at any codebook size — zero exchanges, no UDFs;
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

  /** The m-code column for a vector column: codes[j] = argmin over
    * codewords of the subspace-j distance (ties → smallest codeword
    * index). A pure expression, so callers can carry extra columns
    * (e.g. an IVF list_id) through encoding.
    *
    * Backed by the native [[graft.functions.PqEncodeExpr]] kernel:
    * the unrolled composition ([[codesColComposed]], kept for the
    * bit-equality spec) is k·dim arithmetic nodes and blows janino's
    * generated-method limits at real codebook sizes, knocking the
    * whole stage out of codegen; the kernel is one node at any k. */
  def codesCol(vec: Column, codebook: Array[Array[Float]], m: Int): Column = {
    val dim = codebook(0).length
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.PqEncodeExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(vec), codebook, m))
  }

  /** The unrolled element_at composition of [[codesCol]] — identical
    * arithmetic in identical order; spec-only. */
  private[graft] def codesColComposed(vec: Column,
                                      codebook: Array[Array[Float]],
                                      m: Int): Column = {
    val dim = codebook(0).length
    val sub = dim / m
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    array((0 until m).map { j =>
      array_min(array(codebook.indices.map { c =>
        struct(subL2(vec, codebook(c), j, sub).as("d"), lit(c).as("c"))
      }: _*)).getField("c")
    }: _*)
  }

  /** Encode each vector as m codes. Pure projection — the corpus
    * never shuffles to be encoded. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: Array[Array[Float]], m: Int): DataFrame =
    df.select(col(idCol), codesCol(col(vecCol), codebook, m).as("codes"))

  /** Per-query ADC lookup table: lut[j][c] = subspace-j distance to
    * codeword c (native kernel — see [[codesCol]] on why). */
  private[graft] def lutCol(vec: Column, codebook: Array[Array[Float]],
                     m: Int, sub: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.PqLutExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(vec), codebook, m))

  /** Unrolled composition of [[lutCol]]; spec-only. */
  private[graft] def lutColComposed(vec: Column,
                                    codebook: Array[Array[Float]],
                                    m: Int, sub: Int): Column =
    array((0 until m).map { j =>
      array(codebook.indices.map(c => subL2(vec, codebook(c), j, sub)): _*)
    }: _*)

  /** Σ_j lut[j][codes[j]] — the ADC distance as m array lookups. */
  private def adcDist(lut: Column, codes: Column, m: Int): Column =
    (0 until m).map { j =>
      element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1)
    }.reduce(_ + _)

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
    val q = queries.select(col(idCol).as("q_id"),
      lutCol(col(vecCol), codebook, m, sub).as("__lut"))
    val scored = codes.select(col(idCol).as("n_id"), col("codes"))
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (-round(adcDist(col("__lut"), col("codes"), m), 4)).as("cos"))
    Similarity.topKPerKey(scored, k)
      .select(col("q_id"), col("n_id"), (-col("cos")).as("dist"), col("rk"))
  }

  /** Persist a codebook as a managed table — the index artifact a
    * nightly batch encodes against ([[encodeSaved]]): codes stay
    * comparable across batches only if every batch uses the SAME
    * codebook, so it must live beside the data, not be re-derived. */
  def saveCodebook(spark: org.apache.spark.sql.SparkSession, name: String,
                   codebook: Array[Array[Float]]): Unit = {
    import spark.implicits._
    Bucketing.dropManagedTable(spark, name)
    codebook.zipWithIndex.map { case (w, c) => (c.toLong, w.toSeq) }
      .toSeq.toDF("c", "w")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(name)
  }

  /** Load a [[saveCodebook]] table back into codeword order. */
  def loadCodebook(spark: org.apache.spark.sql.SparkSession,
                   name: String): Array[Array[Float]] = {
    import spark.implicits._
    spark.table(name).orderBy(col("c").asc)
      .select(col("w")).as[Array[Float]].collect()
  }

  /** Encode an arriving batch against the SAVED codebook — a pure
    * projection, no training pass, no corpus contact: the incremental
    * form of [[encode]], and by determinism of the argmin, batch codes
    * == the codes a from-scratch encode of the union would give (the
    * q93 invariant — same shape as incremental CC / exact dedup /
    * vocab merge). */
  def encodeSaved(spark: org.apache.spark.sql.SparkSession, name: String,
                  batch: DataFrame, idCol: String, vecCol: String,
                  m: Int): DataFrame =
    encode(batch, idCol, vecCol, loadCodebook(spark, name), m)

  /** Two-stage retrieval: ADC shortlist, exact re-rank — the standard
    * PQ serving pattern. Stage 1 ([[topK]]) scans only m-byte codes to
    * produce `shortlist` candidates per query; stage 2 computes exact
    * cosine on just those shortlist vectors (queries × shortlist rows
    * — the 99%-pruned remainder of the exact work) and re-ranks to k.
    * Quantization error then costs RECALL only (a true neighbor missing
    * from the shortlist), never ordering among returned results.
    * Output: (q_id, n_id, cos, rk) — the [[Similarity
    * .bruteForceTopKScalable]] shape, rk by (cos desc, n_id asc).
    *
    * Scale shape: the shortlist (queries × shortlist ids) joins the
    * query vectors and broadcasts into ONE corpus scan — the corpus
    * never shuffles for the re-rank. */
  def topKRerank(codes: DataFrame, queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String,
                 codebook: Array[Array[Float]], m: Int, k: Int,
                 shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val short = topK(codes, queries, idCol, vecCol, codebook, m, shortlist)
      .select(col("q_id"), col("n_id"))
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val scored = broadcast(short.join(qv, Seq("q_id")))
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")),
        Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        round(graft.functions.VectorFunctions.cosine(
          col("q_vec"), col("n_vec")), 4).as("cos"))
    Similarity.topKPerKey(scored, k)
  }

  /** Squared L2 between two array columns (probe-selection helper —
    * runs only on queries × centroids rows). */
  private def l2Cols(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** IVF-PQ: probe the `nprobe` L2-nearest IVF lists per query, then
    * ADC-scan only the CODES of vectors in those lists — IVF prunes
    * which vectors are read, PQ shrinks each read to m bytes. With
    * nprobe = #lists the probe union is the whole corpus and the
    * result equals [[topK]] exactly (the oracle identity); the
    * approximate regime is pinned by recall specs.
    *
    * `codedLists` is an [[IvfIndex.build]] `indexed` frame projected
    * through [[codesCol]]: (list_id, id, codes) — the float vectors
    * are NOT needed at scan time, which is the whole point: the scan
    * working set is the probed lists' code rows, ~dim×4/m smaller
    * than the vectors. Probes (with their per-query LUTs) broadcast;
    * the one exchange pattern matches [[IvfIndex.topK]]. */
  def topKIvf(codedLists: DataFrame, centroids: Array[Array[Double]],
              queries: DataFrame, idCol: String, vecCol: String,
              codebook: Array[Array[Float]], m: Int, k: Int,
              nprobe: Int): DataFrame = {
    val spark = codedLists.sparkSession
    import spark.implicits._
    val dim = codebook(0).length
    val sub = dim / m
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val cDf = centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toSeq.toDF("list_id", "c_vec")
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("__d").asc, col("list_id").asc)
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cDf))
      .withColumn("__d", l2Cols(col("q_vec"), col("c_vec")))
      .withColumn("__rk", row_number().over(wProbe))
      .filter(col("__rk") <= nprobe)
      .select(col("q_id"), col("list_id"),
        lutCol(col("q_vec"), codebook, m, sub).as("__lut"))
    val scored = broadcast(probes)
      .join(codedLists.select(col("list_id"), col(idCol).as("n_id"),
        col("codes")), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (-round(adcDist(col("__lut"), col("codes"), m), 4)).as("cos"))
    Similarity.topKPerKey(scored, k)
      .select(col("q_id"), col("n_id"), (-col("cos")).as("dist"), col("rk"))
  }

  /** TWO-LEVEL IVF-PQ — the memory-bounded >10⁹-vector composition:
    * [[IvfIndex.buildTwoLevel]] prunes which (coarse, fine) lists are
    * read (a query scores k1 + nprobe1·k2 centroids instead of ~√N),
    * and PQ shrinks every read row to m bytes. `codedLists2` is a
    * `buildTwoLevel` lists frame projected through [[codesCol]]:
    * (list_id, fine_id, id, codes) — no float vectors at scan time.
    * Probe selection is L2 (the PQ family's metric) at both levels;
    * probes broadcast with their per-query LUTs, so the coded corpus
    * never moves — [[topKIvf]]'s exchange discipline on the deeper
    * hierarchy. With every cell probed the result equals [[topK]]
    * exactly (the q199 oracle identity); the pruned regime is pinned
    * by PqSpec recall assertions. */
  def topKIvf2(codedLists2: DataFrame, coarse: Array[Array[Double]],
               fineSeeds: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String,
               codebook: Array[Array[Float]], m: Int, k: Int,
               nprobe1: Int, nprobe2: Int): DataFrame = {
    val spark = codedLists2.sparkSession
    import spark.implicits._
    val dim = codebook(0).length
    val sub = dim / m
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val cDf = coarse.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toSeq.toDF("list_id", "c_vec")
    val wp1 = Window.partitionBy(col("q_id"))
      .orderBy(col("__d").asc, col("list_id").asc)
    val probeC = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cDf))
      .withColumn("__d", l2Cols(col("q_vec"), col("c_vec")))
      .withColumn("__k1", row_number().over(wp1))
      .filter(col("__k1") <= nprobe1)
      .select(col("q_id"), col("q_vec"), col("list_id"))
    val wp2 = Window.partitionBy(col("q_id"), col("list_id"))
      .orderBy(col("__d2").asc, col("fine_id").asc)
    val probes = probeC.join(broadcast(fineSeeds), Seq("list_id"))
      .withColumn("__d2", l2Cols(col("q_vec"), col("f_vec")))
      .withColumn("__k2", row_number().over(wp2))
      .filter(col("__k2") <= nprobe2)
      .select(col("q_id"), col("list_id"), col("fine_id"),
        lutCol(col("q_vec"), codebook, m, sub).as("__lut"))
    val scored = broadcast(probes)
      .join(codedLists2.select(col("list_id"), col("fine_id"),
        col(idCol).as("n_id"), col("codes")), Seq("list_id", "fine_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (-round(adcDist(col("__lut"), col("codes"), m), 4)).as("cos"))
    Similarity.topKPerKey(scored, k)
      .select(col("q_id"), col("n_id"), (-col("cos")).as("dist"), col("rk"))
  }
}
