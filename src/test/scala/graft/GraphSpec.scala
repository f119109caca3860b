package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** [[Graph.pageRankFixed]]: the distributed loop must reproduce the
  * naive single-machine recurrence EXACTLY (integer arithmetic has no
  * tolerance to hide behind), and ranks must order by connectivity. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The same fixed-point recurrence, computed naively in memory. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
                    dampingPct: Long = 85L,
                    unit: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = unit * (100 - dampingPct) / 100
    var pr = nodes.map(_ -> unit).toMap
    for (_ <- 0 until iters) {
      val inc = edges
        .map { case (s, d) => d -> pr(s) / deg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      pr = nodes.map(n => n -> (base + dampingPct * inc.getOrElse(n, 0L) / 100)).toMap
    }
    pr
  }

  test("pageRankFixed == the naive recurrence, rank-for-rank (triangle " +
    "with a pendant; directed arithmetic, symmetrized edges)") {
    val raw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val sym = raw ++ raw.map(_.swap)
    val got = Graph.pageRankFixed(sym.toDF("src", "dst"), "src", "dst",
        iters = 12)
      .as[(Long, Long)].collect().toMap
    assert(got == naive(sym, 12))
    // the pendant node hangs off the triangle: strictly lowest rank;
    // its anchor (node 3) carries the pendant's mass: strictly highest
    assert(got(4L) == got.values.min)
    assert(got(3L) == got.values.max)
  }

  test("star graph: the hub out-ranks every spoke; spokes tie exactly") {
    val raw = (1L to 8L).map(sp => (0L, sp))
    val sym = raw ++ raw.map(_.swap)
    val got = Graph.pageRankFixed(sym.toDF("src", "dst"), "src", "dst",
        iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == naive(sym, 10))
    val spokes = (1L to 8L).map(got)
    assert(spokes.distinct.size == 1)
    assert(got(0L) > spokes.head)
  }
}
