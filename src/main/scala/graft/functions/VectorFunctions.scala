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
}
