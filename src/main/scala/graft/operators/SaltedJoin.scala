package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the remaining entry in the scale
  * toolkit next to broadcast (small dims), bucketing (co-located
  * fact-fact), and AQE skew splitting (which only fires for
  * sort-merge joins past size thresholds; this is the explicit form
  * for when the planner's heuristics don't).
  *
  * A hot key (one user, one null-ish default, one boilerplate hash)
  * sends its entire row set to ONE reducer of a hash-partitioned
  * join; at 100 TB that straggler defines the stage's wall clock. The
  * fix: append a salt in [0, salts) to the fact side's key and
  * replicate the dim side once per salt value — the hot key's rows
  * spread over `salts` reducers, at the cost of a `salts`× dim
  * duplication (dim shuffle volume, not dim memory; keep the dim the
  * SMALLER side).
  */
object SaltedJoin {

  /** Inner equi-join with the fact side salted `salts` ways. The salt
    * value never affects the result (any fact row joins every dim
    * copy with its salt), only the reducer placement. */
  def join(fact: DataFrame, dim: DataFrame, key: String,
           salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // spark_partition_id + a per-partition counter would also work;
    // monotonically_increasing_id is the cheapest uniform-enough
    // spreader and keeps the expression codegen'd
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
