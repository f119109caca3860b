package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface: building a DataFrame
  * from a hand-constructed logical plan (`Dataset.ofRows`) has no
  * public equivalent, and custom-operator libraries conventionally
  * reach it from the `org.apache.spark.sql` package. Nothing else is
  * accessed; keep it that way. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Flush the listener bus so a test can read listener-accumulated
    * task metrics deterministically (`listenerBus` is
    * `private[spark]` — same convention as the other accessors). */
  def waitListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Unpersist the RDDs backing a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` manages only CacheManager entries; checkpoint
    * blocks otherwise live until the RDD is GC'd — this frees them
    * eagerly for explicit cache lifecycles. */
  def unpersistBackingRdds(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
