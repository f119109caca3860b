package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms on plain edge lists — the Pregel-style
  * join/aggregate loop Spark expresses natively: each superstep is one
  * hash join (rank → outgoing edges) and one shuffle (sum incoming
  * contributions per destination), both on the edge key, so a 100 TB
  * graph iterates at the cost of `iters` edge-partitioned shuffles
  * with no driver-side graph state at all. Connected components live
  * in [[Dedup]] (min-label propagation with large/small-star
  * contraction); this object holds the rank-propagation family.
  */
object Graph {

  /** Fixed-point PageRank: `iters` synchronous power-iteration steps
    * of `pr' = unit·(100-dampingPct)/100 + dampingPct·Σ_in(pr/deg)/100`
    * with ALL arithmetic in integer micro-units (`unit` = 1.0) and
    * integer division — bit-identical across engines and runs, which
    * is what lets the DuckDB oracle pin every rank exactly (float
    * PageRank is only ever approximately reproducible; the
    * deterministic mass shaved by each integer division is the price
    * of an exact gate, and at 1e6 units it is ≤1e-4 relative).
    *
    * The edge list is taken as given (directed); for an undirected
    * graph pass both orientations. Callers must ensure every node has
    * out-degree ≥ 1 (true for symmetrized edges) — classic dangling-
    * mass redistribution is deliberately out of scope here.
    *
    * Scale shape: `edges`, `nodes`, and `deg` are computed once and
    * lineage-severed; each iteration re-derives only the rank table
    * (nodes-sized, far smaller than edges) and is localCheckpointed so
    * plan depth stays O(1) across iterations instead of O(iters) — the
    * connectedComponents CacheManager lesson applied verbatim.
    * Output: (node, pr). */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int, dampingPct: Int = 85,
                    unit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val base = unit * (100 - dampingPct) / 100
    var pr = nodes.select(col("node"), lit(unit).as("pr"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val inc = e
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inc"))
      pr = nodes.join(inc, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"$dampingPct * coalesce(inc, 0L) div 100")).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
