package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("regular graphs are a fixed point: every score stays at init") {
    // 4-cycle: every node has degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 5)
      .select("id", "score").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 1000000L))
  }

  test("star graph: hub outranks leaves, scores match the hand computation") {
    // hub 0 — leaves 1..4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 1)
      .select("id", "score").as[(Long, Long)].collect().toMap
    // hub: 150000 + 85*(4 * (1000000 div 1)) div 100 = 150000 + 3400000
    assert(got(0L) == 3550000L)
    // leaf: 150000 + 85*(1000000 div 4) div 100 = 150000 + 212500
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 362500L))
  }

  test("triangle counts: K4 has 3 per node, squares have none") {
    // K4 on 1..4 (4 triangles, each node in 3) ⊔ 4-cycle on 5..8 (none)
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val square = Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L))
    val edges = (k4 ++ square).toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("min-label propagation: labels converge to component minima") {
    // path 1-2-3-4 (radius 3 from node 1) ⊔ pair 10-11 ⊔ triangle 20-21-22
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val got = Graph.minLabelPropagation(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("min-label propagation: round count bounds the propagation radius") {
    // path 1-2-3-4-5: after 1 round node 5 only sees node 4's initial label
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.minLabelPropagation(edges, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("min-label propagation: driver solve equals the distributed loop") {
    val edges = Seq((7L, 3L), (3L, 9L), (9L, 7L), (5L, 6L)).toDF("src", "dst")
    val small = Graph.minLabelPropagation(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.minLabelPropagation(edges, rounds = 2, driverSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(small == dist)
    assert(small == Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 5L -> 5L, 6L -> 5L))
  }

  test("bfs hops: exact distances within the round radius, unreached absent") {
    // path 1-2-3-4-5-6, source 1; 7-8 is a separate unreached component
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L)).toDF("src", "dst")
    val src = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, src, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfs hops: multi-source takes the nearest seed, driver == distributed") {
    // path 1..7, sources at both ends: middle node is 3 hops from either
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val src = Seq(1L, 7L).toDF("id")
    val small = Graph.bfsHops(edges, src, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.bfsHops(edges, src, rounds = 4, driverSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(small == dist)
    assert(small == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 0L))
  }

  test("sssp weighted: takes the cheaper many-edge path, driver == distributed") {
    // 1→4 direct costs 10; 1→2→3→4 costs 1+1+1 = 3. Separate pair 7-8
    // stays unreached. Source 1.
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (7L, 8L, 5L)).toDF("src", "dst", "w")
    val src = Seq(1L).toDF("id")
    val small = Graph.ssspWeighted(edges, src, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.ssspWeighted(edges, src, rounds = 4, driverSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(small == dist)
    assert(small == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("sssp weighted: round budget bounds path length, w≡1 matches bfs hops") {
    // path 1..6 with unit weights: after 2 rounds only radius-2 reached
    val edges = (1L to 5L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val src = Seq(1L).toDF("id")
    val got = Graph.ssspWeighted(edges, src, rounds = 2)
      .as[(Long, Long)].collect().toMap
    val hops = Graph.bfsHops(edges.select($"src", $"dst"), src, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == hops)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("sssp weighted: parallel edges fold to the cheapest weight") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 2L), (2L, 1L, 7L))
      .toDF("src", "dst", "w")
    val got = Graph.ssspWeighted(edges, Seq(1L).toDF("id"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 2L))
  }

  test("bfs hops: a source off the graph stays at hops 0 and reaches nothing") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.bfsHops(edges, Seq(99L).toDF("id"), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(99L -> 0L))
  }

  test("k-core peel: triangle survives, tail peels outward round by round") {
    // triangle 1-2-3 plus tail 3-4-5: round 1 removes 5 (deg 1),
    // round 2 removes 4 (its only remaining edge died with 5)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.kCorePeel(edges, k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 2L, 5L -> 1L))
  }

  test("k-core peel: an isolated pair is fully peeled in round 1") {
    val edges = Seq((10L, 11L)).toDF("src", "dst")
    val got = Graph.kCorePeel(edges, k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L))
  }

  test("orientation and duplicate edges normalize away") {
    val a = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val b = Seq((2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L)).toDF("src", "dst")
    val ra = Graph.pageRankInt(a, 3).select("id", "score").as[(Long, Long)].collect().toMap
    val rb = Graph.pageRankInt(b, 3).select("id", "score").as[(Long, Long)].collect().toMap
    assert(ra == rb)
    assert(ra(2L) > ra(1L)) // middle node of the path dominates
  }
}
