package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so the whole similarity pipeline stays inside whole-stage
  * codegen and scales linearly with row count.
  *
  * All accumulation is left-to-right in index order in DOUBLE, which
  * keeps results bit-comparable with the DuckDB oracle's
  * `list_sum(list_transform(...))` form.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ in double precision. */
  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two equal-length float/double vectors —
    * the native [[CosineSim]] expression (fused loop, whole-stage
    * codegen, no per-row intermediate arrays). Bit-identical to the
    * composed `dot/(norm·norm)` form, which [[cosineComposed]] keeps
    * for reference/fallback. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(CosineSim(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** The higher-order-function composition (CodegenFallback path). */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Argmax-cosine centroid id over a driver-side k×dim matrix — a
    * pure per-row projection (no join, no window, no shuffle); the
    * IVF assignment primitive. */
  def nearestCentroid(a: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(NearestCentroid(
      org.apache.spark.sql.GraftSqlBridge.expression(a), centroids))

  /** Sign-bit LSH bucket key from the first `bits` vector components:
    * vectors whose leading components agree in sign land in the same
    * bucket. A deterministic, shuffle-friendly partition key — the
    * scale path for ANN (bucket-join instead of cross-join), with
    * far fewer candidate pairs than brute force. */
  def signBucket(a: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(a, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** Sign-bit bucket over components [start, start+bits) — the
    * per-band key for multi-band LSH (each band reads a disjoint
    * slice of the vector). */
  def signBucketAt(a: Column, start: Int, bits: Int): Column =
    concat((start + 1 to start + bits).map(i =>
      when(element_at(a, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (outDim ×
    * inDim): entry (j, i) is +1 iff the first hex char of
    * md5("jl|j|i") is ≥ '8' — a derivation a SQL oracle reproduces
    * verbatim with `md5(...)` strings, so the projection (unlike a
    * seeded PRNG matrix) is cross-engine exact. Dense ±1 entries are
    * Achlioptas's database-friendly JL construction. */
  def jlSignMatrix(outDim: Int, inDim: Int): Seq[Seq[Long]] =
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl|$j|$i".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) >= 8) 1L else -1L
      }
    }

  /** Fixed-point JL projection: component j = Σᵢ s_ji · ⌊vᵢ·10⁴⌋.
    * The input is quantized to 1e-4 fixed point FIRST (floor — the
    * one float→int op, identical in both engines), then everything
    * is BIGINT, so projected vectors and any ranking over them are
    * exact cross-engine — the repo's fixed-point-summand rule
    * applied to dimensionality reduction. The matrix rides along as
    * a codegen'd nested literal (outDim·inDim longs — bytes, not a
    * join). */
  def jlProject(vec: Column, m: Seq[Seq[Long]]): Column = {
    val s = typedLit(m)
    val inDim = m.head.length
    transform(sequence(lit(0), lit(m.length - 1)), j =>
      aggregate(sequence(lit(0), lit(inDim - 1)), lit(0L),
        (acc, i) => acc +
          element_at(element_at(s, (j + lit(1)).cast("int")),
            (i + lit(1)).cast("int")) *
          floor(element_at(vec, (i + lit(1)).cast("int")).cast("double")
            * 10000).cast("long")))
  }

  /** Σ aᵢ·bᵢ over two equal-length BIGINT arrays — exact. */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
}
