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

  test("randomized: triangleCounts equals brute-force triple enumeration") {
    // seeded multigraph with duplicates, reversals, and self-loops —
    // all must canonicalize away; the expected counts come from a
    // direct check of every (a < b < c) triple against the undirected
    // edge set, independent of the wedge-join pipeline
    val rnd = new scala.util.Random(20260816L)
    val raw = (1 to 250).map { _ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1)
    }
    val und = raw.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val expected = (for {
      (a, i) <- nodes.zipWithIndex
      (b, j) <- nodes.zipWithIndex.drop(i + 1)
      c <- nodes.drop(j + 1)
      if und((a, b)) && und((b, c)) && und((a, c))
      n <- Seq(a, b, c)
    } yield n).groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = Graph.triangleCounts(raw.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("randomized: pageRank equals a single-threaded integer reference") {
    // the same truncating-integer recurrence implemented directly over
    // in-memory maps — an independent spec of every DIV placement
    val rnd = new scala.util.Random(20260817L)
    val edges = (1 to 150).map { _ =>
      (rnd.nextInt(25).toLong + 1, rnd.nextInt(25).toLong + 1,
        rnd.nextInt(9).toLong + 1)
    }
    val scale = 1000000000L
    val nodes = edges.flatMap { case (s, d, _) => Seq(s, d) }.distinct.sorted
    val n = nodes.size.toLong
    val base = (scale * 15L) / (100L * n)
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 3) {
      val contrib = edges
        .map { case (s, d, w) => d -> (pr(s) * w) / ow(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      pr = nodes.map(x => x -> (base + (85L * contrib.getOrElse(x, 0L)) / 100L)).toMap
    }
    val got = Graph.pageRank(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === pr)
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
