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
  * Spark 3.3+ has an automatic runtime variant
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
  * is the explicit form for when the planner's heuristics don't fire
  * (pre-filtered dims, non-equi pre-conditions, cross-format joins).
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

  /** Just the pruned fact side (for joins composed separately).
    * Integral and string keys are supported (the sketch hashes
    * integral keys as longs, strings as bytes). */
  def prune(fact: DataFrame, factKey: Column,
            dim: DataFrame, dimKey: Column,
            expectedDimKeys: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = fact.sparkSession
    // one pass over dim builds the filter on the driver...
    val bf = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    // ...and an executor-broadcast ships it once per node, not per task
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
