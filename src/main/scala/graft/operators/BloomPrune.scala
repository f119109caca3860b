package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (NOTES round-1 item 7): shrink the
  * shuffled side of a selective join BEFORE the exchange.
  *
  * For `fact ⋈ dim` where the dim side is selective but too large to
  * broadcast as a hash relation, a Bloom filter over the dim keys IS
  * broadcastable: build it with one small aggregation, ship it to
  * every fact scan task, and drop non-joining fact rows at the scan —
  * the fact shuffle then carries only rows that can match (modulo the
  * configured false-positive rate). At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the join's
  * actual input.
  *
  * The sketch is built by Spark's native `BloomFilterAggregate`
  * (distributed partial aggregation over `xxhash64(key)`) and probed
  * by the native `BloomFilterMightContain` expression — the same pair
  * the optimizer's runtime row-level filtering uses
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), so the prune
  * filter stays inside whole-stage codegen in exactly the
  * scan-adjacent stage the operator exists to accelerate. (The first
  * cut filtered through a per-row `mightContain` UDF, which broke
  * codegen there; the UDF path survives only as a fallback.) This
  * operator is the explicit form for when the planner's heuristics
  * don't fire (pre-filtered dims, non-equi pre-conditions,
  * cross-format joins).
  */
object BloomPrune {

  /** `fact` reduced to rows whose `factKey` might join `dim.dimKey`,
    * then inner-joined. `expectedDimKeys`/`fpp` size the filter
    * (1% fpp ≈ 9.6 bits/key — a 10M-key dim is ~12 MB broadcast). */
  def prunedJoin(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = prune(fact, col(factKey), dim, col(dimKey), expectedDimKeys, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Just the pruned fact side (for joins composed separately).
    * Both sides hash the key with `xxhash64`, so any hashable key
    * type works; a hash collision only adds to the false-positive
    * rate the Bloom filter already carries.
    *
    * The native→UDF fallback is LOUD: a regression in the internal
    * expression pair (e.g. an API move) degrades every prune to a
    * codegen-breaking UDF, so the throwable is logged at WARN — and
    * the production plan shape (might_contain present, no UDF) is
    * pinned in ScaleOpsSpec so a silent degrade fails the suite. */
  def prune(fact: DataFrame, factKey: Column,
            dim: DataFrame, dimKey: Column,
            expectedDimKeys: Long, fpp: Double): DataFrame =
    try pruneNative(fact, factKey, dim, dimKey, expectedDimKeys, fpp)
    catch { case scala.util.control.NonFatal(e) =>
      log.warn("BloomPrune: native BloomFilterAggregate/might_contain path " +
        "failed; falling back to the non-codegen UDF probe", e)
      pruneUdf(fact, factKey, dim, dimKey, expectedDimKeys, fpp)
    }

  private def pruneNative(fact: DataFrame, factKey: Column,
                          dim: DataFrame, dimKey: Column,
                          expectedDimKeys: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // optimal bit count for the target fpp, capped at the engine's own
    // runtime-filter ceiling (64M bits = 8 MB)
    val ln2sq = math.log(2) * math.log(2)
    val numBits = math.min(67108864L,
      math.max(64L, math.ceil(-expectedDimKeys * math.log(fpp) / ln2sq).toLong))
    val agg = new BloomFilterAggregate(
      expression(xxhash64(dimKey)),
      Literal(expectedDimKeys), Literal(numBits)).toAggregateExpression()
    // distributed build: partial sketches merge in the final aggregate;
    // the driver receives only the serialized filter bytes
    val bytes = dim.select(column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
    if (bytes == null) fact.filter(lit(false)) // empty dim: nothing can join
    else fact.filter(column(BloomFilterMightContain(
      Literal(bytes, BinaryType), expression(xxhash64(factKey)))))
  }

  /** Fallback: driver-built sketch probed through a UDF (not codegen —
    * kept only for environments where the internal expression pair is
    * unavailable; integral and string keys only, like `stat.bloomFilter`). */
  private def pruneUdf(fact: DataFrame, factKey: Column,
                       dim: DataFrame, dimKey: Column,
                       expectedDimKeys: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = fact.sparkSession
    val bf = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val keyType = fact.select(factKey).schema.head.dataType
    val predicate = keyType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val mc = udf((k: java.lang.Long) =>
          k != null && bcast.value.mightContainLong(k.longValue()))
        mc(factKey.cast("long"))
      case StringType =>
        val mc = udf((s: String) => s != null && bcast.value.mightContainString(s))
        mc(factKey)
      case other => throw new IllegalArgumentException(
        s"BloomPrune: unsupported key type $other (integral or string only)")
    }
    fact.filter(predicate)
  }
}
