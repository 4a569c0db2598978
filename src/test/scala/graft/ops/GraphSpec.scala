package graft.ops

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank: symmetric 2-cycle is a fixed point at scale/2") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, "src", "dst", "w", iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // base 75e6 + 85% of the full 500e6 inflow = 500e6 again, exactly
    assert(got === Seq((1L, 500000000L), (2L, 500000000L)))
  }

  test("pageRank: star inflow ranks hub > spoke > dangling, exact values") {
    // 2->1, 3->1, 1->2; node 3 has no inflow, node 1 collects two
    val edges = Seq((2L, 1L, 1L), (3L, 1L, 1L), (1L, 2L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, "src", "dst", "w", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toMap
    // base = 15e9 // 300 = 50e6; init = 333,333,333
    assert(got(1L) === 50000000L + (85L * 666666666L) / 100L)
    assert(got(2L) === 50000000L + (85L * 333333333L) / 100L)
    assert(got(3L) === 50000000L)
    assert(got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("pageRank: total rank never exceeds scale (truncation only loses)") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 2L), (3L, 1L, 5L),
      (1L, 3L, 1L), (4L, 1L, 2L)).toDF("src", "dst", "w")
    val total = Graph.pageRank(edges, "src", "dst", "w", iters = 5)
      .agg(org.apache.spark.sql.functions.sum("rank")).as[Long].first()
    assert(total <= 1000000000L)
    assert(total > 900000000L, "truncation loss should stay small")
  }

  test("pageRank: edge weight steers rank proportionally") {
    // node 1 routes 3/4 of its mass to node 2, 1/4 to node 3; back
    // edges keep the chain live. After one iteration from uniform
    // 333,333,333: contrib(2) = (pr*3) div 4, contrib(3) = (pr*1) div 4
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, "src", "dst", "w", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toMap
    val base = 50000000L
    val pr0 = 333333333L
    assert(got(2L) === base + (85L * ((pr0 * 3L) / 4L)) / 100L)
    assert(got(3L) === base + (85L * ((pr0 * 1L) / 4L)) / 100L)
    assert(got(2L) > got(3L))
  }

  test("triangleCounts: closed triangles only, counted once per vertex") {
    // triangle 1-2-3 (one edge given reversed + duplicated), a dangling
    // edge 3-4, and an open wedge 4-5, 5-6
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("triangleCounts: two triangles sharing an edge") {
    // 1-2-3 and 2-3-4 share edge 2-3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("pageRank: result independent of input partitioning") {
    val edges = (1L to 200L)
      .map(i => (i, (i * 7) % 50 + 1, (i % 5) + 1))
      .toDF("src", "dst", "w")
    val a = Graph.pageRank(edges, "src", "dst", "w", iters = 3)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(edges.repartition(13), "src", "dst", "w", iters = 3)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }
}
