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

  private def stats(edges: Seq[(Long, Long)]) =
    Graph.triangleStats(edges.toDF("id_a", "id_b"))
      .as[(Long, Long, Long, Long)].collect().head

  test("triangleStats: K4 has 4 triangles and clustering 1; a star " +
    "has none (the hub generates no wedges at the oriented apex — " +
    "degree orientation, not hub fan-out); a path has none") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(stats(k4) == ((4L, 6L, 4L, 10000L)))
    val star = (1L to 6L).map((0L, _))
    val (n, e, t, c) = stats(star)
    assert((n, e, t, c) == ((7L, 6L, 0L, 0L)))
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 0L, 0L)))
  }

  test("triangleStats tolerates duplicate and reversed input pairs") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 1L), (1L, 2L))
    assert(stats(tri) == ((3L, 3L, 1L, 10000L)))
  }

  test("localClustering: K4 nodes are fully clustered, star nodes " +
    "all zero, and the bowtie's shared node halves") {
    def local(edges: Seq[(Long, Long)]) =
      Graph.localClustering(edges.toDF("id_a", "id_b"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(local(k4).values.toSet == Set((3L, 3L, 10000L)))
    val star = (1L to 5L).map((0L, _))
    assert(local(star)(0L) == ((5L, 0L, 0L)))
    assert(local(star)(1L) == ((1L, 0L, 0L)))
    // bowtie: node 3 sits in both triangles, deg 4 → 2·2/(4·3)
    val bowtie = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L))
    val got = local(bowtie)
    assert(got(3L) == ((4L, 2L, 3333L)))
    assert(got(1L) == ((2L, 1L, 10000L)))
  }

  test("newTriangles materializes exactly the triangles touching a " +
    "batch edge, once each, across 1/2/3-new-edge classes") {
    val bowtie = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L))
    def tri(newIdx: Set[Int]) = {
      val (n, o) = bowtie.zipWithIndex.partition(e => newIdx(e._2))
      Graph.newTriangles(o.map(_._1).toDF("id_a", "id_b"),
          n.map(_._1).toDF("id_a", "id_b"))
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(tri(Set(0)) == Set((1L, 2L, 3L)))          // one new edge
    assert(tri(Set(0, 1)) == Set((1L, 2L, 3L)))       // two new edges
    assert(tri(Set(0, 1, 2)) == Set((1L, 2L, 3L)))    // all three new
    assert(tri(Set(1, 3)) == Set((1L, 2L, 3L), (3L, 4L, 5L)))
    assert(tri(Set.empty[Int]).isEmpty)
  }

  /** The inclusion–exclusion fold must land on the full-graph count
    * for splits exercising every term: all-new triangles (S_nn/3),
    * two-new (S_mix/2), one-new (S_oo), mixtures across shared nodes,
    * and the degenerate all-old / all-new batches. */
  test("triangleCountDelta == from-scratch across representative " +
    "old/new splits of a bowtie plus pendant") {
    // bowtie: triangles (1,2,3) and (3,4,5) sharing node 3; pendant 6
    val all = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L), (5L, 6L))
    val full = stats(all)._3
    assert(full == 2L)
    // new-edge index sets: one new edge per triangle term S_oo; two
    // new (S_mix); a whole triangle new (S_nn); one edge from EACH
    // triangle; everything new; nothing new
    val splits = Seq(Set(0), Set(0, 1), Set(0, 1, 2), Set(2, 5),
      Set(0, 1, 2, 3, 4, 5, 6), Set.empty[Int], Set(3, 4, 5, 6))
    for (newIdx <- splits) {
      val (newE, oldE) = all.zipWithIndex.partition { case (_, i) =>
        newIdx.contains(i)
      }
      val oldTri = stats(oldE.map(_._1))._3
      val got = Graph.triangleCountDelta(
        Seq(oldTri).toDF("n_triangles"),
        oldE.map(_._1).toDF("id_a", "id_b"),
        newE.map(_._1).toDF("id_a", "id_b"))
        .as[Long].collect().head
      assert(got == full, s"new=$newIdx old=${oldE.map(_._1)}")
    }
  }
}
