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

  /** Triangle count + global clustering coefficient of an undirected
    * simple graph given as candidate pairs (id_a, id_b; orientation
    * and duplicates tolerated). Degree-oriented counting: each edge
    * points from its lower-(degree, id) endpoint to the higher, so
    * every wedge is generated at its LOWEST-degree apex — fan-out is
    * bounded by the graph's degeneracy, not its max degree (the
    * arboricity bound that survives power-law graphs; a hub of degree
    * 10⁶ generates no wedges at all unless both neighbors out-rank
    * it). Output: one row (n_nodes, n_edges, n_triangles,
    * clustering_bp = 3·triangles/wedges in basis points). */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val p = pairs.select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
      .localCheckpoint(true)
    val deg = p.select(col("id_a").as("n"))
      .unionByName(p.select(col("id_b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val ranked = p
      .join(deg.select(col("n").as("id_a"), col("deg").as("__da")),
        Seq("id_a"))
      .join(deg.select(col("n").as("id_b"), col("deg").as("__db")),
        Seq("id_b"))
    val e = ranked.select(
        when(struct(col("__da"), col("id_a")) <
          struct(col("__db"), col("id_b")), col("id_a"))
          .otherwise(col("id_b")).as("u"),
        when(struct(col("__da"), col("id_a")) <
          struct(col("__db"), col("id_b")), col("id_b"))
          .otherwise(col("id_a")).as("v"))
      .localCheckpoint(true)
    val wedges = e.select(col("u"), col("v").as("v1"))
      .join(e.select(col("u"), col("v").as("v2")), Seq("u"))
      .filter(col("v1") < col("v2"))
    val und = e.select(col("u").as("x"), col("v").as("y"))
      .unionByName(e.select(col("v").as("x"), col("u").as("y")))
    val tri = wedges.join(und,
        col("v1") === col("x") && col("v2") === col("y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    // coalesce: sum over an empty degree table is null, not 0
    val nn = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("deg * (deg - 1) div 2")), lit(0L))
        .as("__n_wedges"))
    nn.crossJoin(p.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        when(col("__n_wedges") === 0, lit(0L))
          .otherwise(expr("n_triangles * 3L * 10000L div __n_wedges"))
          .as("clustering_bp"))
  }

  /** Per-node triangle counts and LOCAL clustering coefficients —
    * q274's global readout at vertex grain (which nodes sit in
    * cliques vs chains). Same degree-oriented wedge generation; the
    * confirming semi-join becomes an inner join so each triangle
    * materializes once as (apex, v1, v2) and explodes to its three
    * vertices — output size ∝ 3·triangles, bounded by the same
    * degeneracy argument. Output: (n, deg, n_tri, local_bp) for every
    * node of the graph (0 rows of triangles ⇒ local_bp 0). */
  def localClustering(pairs: DataFrame): DataFrame = {
    val p = pairs.select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
      .localCheckpoint(true)
    val deg = p.select(col("id_a").as("n"))
      .unionByName(p.select(col("id_b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val ranked = p
      .join(deg.select(col("n").as("id_a"), col("deg").as("__da")),
        Seq("id_a"))
      .join(deg.select(col("n").as("id_b"), col("deg").as("__db")),
        Seq("id_b"))
    val e = ranked.select(
        when(struct(col("__da"), col("id_a")) <
          struct(col("__db"), col("id_b")), col("id_a"))
          .otherwise(col("id_b")).as("u"),
        when(struct(col("__da"), col("id_a")) <
          struct(col("__db"), col("id_b")), col("id_b"))
          .otherwise(col("id_a")).as("v"))
      .localCheckpoint(true)
    val und = e.select(col("u").as("x"), col("v").as("y"))
      .unionByName(e.select(col("v").as("x"), col("u").as("y")))
    val tris = e.select(col("u"), col("v").as("v1"))
      .join(e.select(col("u"), col("v").as("v2")), Seq("u"))
      .filter(col("v1") < col("v2"))
      .join(und, col("v1") === col("x") && col("v2") === col("y"),
        "left_semi")
    val perNode = tris
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("local_bp",
        when(col("deg") < 2, lit(0L))
          .otherwise(expr("n_tri * 2L * 10000L div (deg * (deg - 1))")))
  }

  /** The NEW triangles a batch of edges creates, materialized as
    * distinct (a, b, c) vertex triples (a < b < c) — the exact set
    * [[triangleCountDelta]] counts by inclusion–exclusion without
    * materializing. Used when the delta must be ATTRIBUTED (per-node
    * folds, audit trails); costs one dedup shuffle of the candidate
    * triples, bounded by Σ common-neighbor counts over batch edges —
    * still ∝ batch × degree, never the old graph re-paired. */
  def newTriangles(oldE: DataFrame, newE: DataFrame): DataFrame = {
    def canon(df: DataFrame) =
      df.select(least(col("id_a"), col("id_b")).as("u"),
          greatest(col("id_a"), col("id_b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
    val o = canon(oldE)
    val n = canon(newE).localCheckpoint(true)
    val und = o.unionByName(n)
      .select(col("u").as("x"), col("v").as("y"))
      .unionByName(o.unionByName(n)
        .select(col("v").as("x"), col("u").as("y")))
      .localCheckpoint(true)
    n.join(und.select(col("x").as("u"), col("y").as("w")), Seq("u"))
      .join(und.select(col("x").as("v"), col("y").as("w")), Seq("v", "w"))
      .select(least(col("u"), col("v"), col("w")).as("a"),
        greatest(col("u"), col("v"), col("w")).as("c"),
        (col("u") + col("v") + col("w") -
          least(col("u"), col("v"), col("w")) -
          greatest(col("u"), col("v"), col("w"))).as("b"))
      .select(col("a"), col("b"), col("c")).distinct()
  }

  /** INCREMENTAL triangle count: triangles of old ∪ new without ever
    * re-pairing the old graph — per-batch work is ∝ |new edges| ×
    * degree, not |old edges|². `oldTriangles` is the standing count
    * (one row, `n_triangles`, e.g. a prior [[triangleStats]] run);
    * `oldE`/`newE` must be DISJOINT undirected edge sets.
    *
    * The fold is an exact inclusion–exclusion over how many batch
    * edges each new triangle contains. For every new edge (u,v),
    * classify each common neighbor w by the tags of (u,w) and (v,w):
    * summing over all new edges, both-old wedges count each 1-new-edge
    * triangle once (S_oo = T1), mixed wedges count each 2-new-edge
    * triangle twice (S_mix = 2·T2), both-new wedges count each all-new
    * triangle three times (S_nn = 3·T3) — so the number of NEW
    * triangles is exactly S_oo + S_mix/2 + S_nn/3, all integer.
    * Output: one row (n_triangles) for the full graph. */
  def triangleCountDelta(oldTriangles: DataFrame,
                         oldE: DataFrame, newE: DataFrame): DataFrame = {
    def canon(df: DataFrame, tag: Int) =
      df.select(least(col("id_a"), col("id_b")).as("u"),
          greatest(col("id_a"), col("id_b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .withColumn("t", lit(tag))
    val o = canon(oldE, 0)
    val n = canon(newE, 1).localCheckpoint(true)
    // both orientations of old ∪ new, tagged
    val und = o.unionByName(n)
      .select(col("u").as("x"), col("v").as("y"), col("t"))
      .unionByName(o.unionByName(n)
        .select(col("v").as("x"), col("u").as("y"), col("t")))
      .localCheckpoint(true)
    val s = n
      .join(und.select(col("x").as("u"), col("y").as("w"),
        col("t").as("__t1")), Seq("u"))
      .join(und.select(col("x").as("v"), col("y").as("w"),
        col("t").as("__t2")), Seq("v", "w"))
      .agg(sum(when(col("__t1") === 0 && col("__t2") === 0, 1L)
          .otherwise(0L)).as("__s_oo"),
        sum(when(col("__t1") =!= col("__t2"), 1L).otherwise(0L))
          .as("__s_mix"),
        sum(when(col("__t1") === 1 && col("__t2") === 1, 1L)
          .otherwise(0L)).as("__s_nn"))
      .select((coalesce(col("__s_oo"), lit(0L)) +
        expr("coalesce(__s_mix, 0L) div 2") +
        expr("coalesce(__s_nn, 0L) div 3")).as("__delta"))
    oldTriangles.select(col("n_triangles")).crossJoin(s)
      .select((col("n_triangles") + col("__delta")).as("n_triangles"))
  }

  /** Synchronous label propagation: `iters` supersteps of "adopt the
    * most frequent label among my neighbors and myself", ties broken
    * by the SMALLEST label — the deterministic variant of LPA (the
    * async/random classic is irreproducible by design; a gate needs
    * the synchronous deterministic form). Including the node's own
    * current label dampens the 2-cycle oscillation the pure-neighbor
    * rule exhibits on bipartite structures.
    *
    * Each superstep is one join (labels onto the symmetrized
    * edge+self list) and two key-grained aggs — the Pregel shape;
    * lineage is severed per step (localCheckpoint — the CC planning
    * lesson: an iterated join otherwise re-plans the whole chain each
    * step and CacheManager lookups go quadratic). The argmax is
    * `min(struct(-count, label))` — exactly the oracle's
    * `row_number() OVER (ORDER BY c DESC, lab ASC) = 1` total order.
    * Input: unique undirected pairs (id_a, id_b). Output: (n, lab).
    */
  /** Community-quality report over a labeling: per community its
    * size, intra-community edge count, degree mass, and the EXACT
    * integer modularity numerator `4m·L_c − D_c²` (modularity Q =
    * Σ_c num_c / 4m² — the division never happens, so negative
    * numerators cannot hit the floor-vs-trunc cross-engine trap; the
    * `lab = −1` total row carries Σ num_c and the denominator facts
    * m, 2m). Scale shape: one degree agg, two label joins keyed on
    * node, one group per side — never an all-pairs anything. */
  def modularityReport(pairs: DataFrame, labels: DataFrame): DataFrame = {
    val ed = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .distinct().localCheckpoint(true)
    val m = ed.count()
    val deg = ed.select(col("a").as("n"))
      .unionByName(ed.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val dc = labels.join(deg, Seq("n"))
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("size"), sum(col("dg")).as("deg_sum"))
    val la = labels.select(col("n").as("a"), col("lab"))
    val lb = labels.select(col("n").as("b"), col("lab").as("__lb"))
    val lc = ed.join(la, Seq("a")).join(lb, Seq("b"))
      .filter(col("lab") === col("__lb"))
      .groupBy(col("lab")).agg(count(lit(1)).as("intra"))
    val per = dc.join(lc, Seq("lab"), "left")
      .select(col("lab"), col("size"),
        coalesce(col("intra"), lit(0L)).as("intra_edges"),
        col("deg_sum").cast("long").as("deg_sum"),
        (lit(4L * m) * coalesce(col("intra"), lit(0L)) -
          col("deg_sum") * col("deg_sum")).cast("long").as("num_fp"))
    per.unionByName(
      per.agg(sum(col("size")).cast("long").as("size"),
          sum(col("num_fp")).cast("long").as("num_fp"))
        .select(lit(-1L).as("lab"), col("size"),
          lit(m).as("intra_edges"), lit(2L * m).as("deg_sum"),
          col("num_fp")))
  }

  def labelPropagation(pairs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct()
    val nodes = edges.select(col("a").as("n")).distinct()
    val nb = edges.unionByName(
        nodes.select(col("n").as("a"), col("n").as("b")))
      .localCheckpoint(true)
    var labels = nodes.select(col("n"), col("n").as("lab"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val prev = labels
      labels = nb
        .join(labels.select(col("n").as("b"), col("lab")), Seq("b"))
        .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("__c"))
        .groupBy(col("a"))
        .agg(min(struct((-col("__c")).as("nc"), col("lab").as("lab")))
          .as("__m"))
        .select(col("a").as("n"), col("__m.lab").as("lab"))
        .localCheckpoint(true)
      org.apache.spark.sql.GraftSqlBridge.unpersistBackingRdds(prev)
    }
    labels
  }
}
