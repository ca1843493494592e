package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {

  test("pageRank: symmetric 2-cycle splits evenly, mass sums to 1") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("pageRank: dangling mass redistributes uniformly (hand-computed)") {
    import spark.implicits._
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // r0 = (.5, .5); b is dangling with mass .5 -> dm/N = .25
    // a: .15/2 + .85*(0 + .25) = .2875 ; b: .075 + .85*(.5+.25) = .7125
    assert(math.abs(r("a") - 0.2875) < 1e-12)
    assert(math.abs(r("b") - 0.7125) < 1e-12)
  }

  test("pageRank: edge weights steer proportional mass") {
    import spark.implicits._
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", Some("w"), iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // after one iteration from uniform 1/3: contrib(b) = 1/3 * 3/4,
    // contrib(c) = 1/3 * 1/4 -> b - c = 0.85 * (1/3) * (1/2)
    assert(math.abs((r("b") - r("c")) - 0.85 / 6.0) < 1e-12)
  }

  test("pageRank: equals a dense driver-side power iteration on a random graph; sum stays 1") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val n = 17
    val edges = (0 until 60).map { _ =>
      (s"n${rng.nextInt(n)}", s"n${rng.nextInt(n)}", 1.0 + rng.nextInt(3))
    }.distinct
    val df = edges.toDF("src", "dst", "w")
    val iters = 5
    val got = Graph.pageRank(df, "src", "dst", Some("w"), iters = iters)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "total mass invariant")

    // independent dense reference
    val agg = edges.groupBy(e => (e._1, e._2)).map { case (k, xs) => k -> xs.map(_._3).sum }
    val nodes = agg.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val outw = agg.groupBy(_._1._1).map { case (s, xs) => s -> xs.values.sum }
    var rank = Array.fill(nodes.size)(1.0 / nodes.size)
    (1 to iters).foreach { _ =>
      val contrib = Array.fill(nodes.size)(0.0)
      agg.foreach { case ((s, d), w) =>
        contrib(idx(d)) += rank(idx(s)) * w / outw(s)
      }
      val dm = nodes.filterNot(outw.contains).map(v => rank(idx(v))).sum
      rank = nodes.indices.toArray.map(i =>
        0.15 / nodes.size + 0.85 * (contrib(i) + dm / nodes.size))
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(idx(v))) < 1e-9, s"node $v")
    }
  }

  test("triangleCount: K4 + square + pendant, robust to duplicates/reversal/self-loops") {
    import spark.implicits._
    // K4 on 1..4 (4 triangles, each node in 3), square 10-11-12-13 (none),
    // pendant 4-20 (none); plus noise: duplicate, reversed and self edges
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val noise = Seq((2L, 1L), (1L, 2L), (3L, 3L), (4L, 20L))
    val edges = (k4 ++ square ++ noise).toDF("s", "d")
    val got = Graph.triangleCount(edges, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("coOccurrenceEdges matches an unguarded pair join below the cap") {
    import spark.implicits._
    // (unit, cell) memberships; duplicates must collapse (set semantics)
    val occ = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (1L, "a"),
      (1L, "b"), (2L, "b"),
      (1L, "c"), (2L, "c"), (4L, "c"),
      (5L, "d")).toDF("u", "cell")
    val got = Graph.coOccurrenceEdges(occ, "u", Seq("cell"),
        minCells = 2, maxCellSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pairs sharing >= 2 cells: (1,2) shares a,b,c — nothing else repeats
    assert(got === Set((1L, 2L)))
    // minCells = 1 is the raw co-occurrence graph (every in-cell pair)
    val all = Graph.coOccurrenceEdges(occ, "u", Seq("cell"),
        minCells = 1, maxCellSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
  }

  test("coOccurrenceEdges excludes planted hot cells before any pairing") {
    import spark.implicits._
    // hot cell "hot" holds 50 units (> cap 10): the stop-word guard must
    // drop it entirely — no pair may survive on its evidence alone
    val hot = (1L to 50L).map(u => (u, "hot"))
    val cold = Seq((1L, "c1"), (2L, "c1"), (1L, "c2"), (2L, "c2"))
    val occ = (hot ++ cold).toDF("u", "cell")
    val got = Graph.coOccurrenceEdges(occ, "u", Seq("cell"),
        minCells = 1, maxCellSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)),
      "hot-cell-only pairs (e.g. (3,4): C(50,2)=1225 of them) must not appear")
  }

  test("triangleCount matches a driver-side brute force on a random-ish graph") {
    import spark.implicits._
    // deterministic pseudo-random graph on 30 nodes
    val edges = (for {
      a <- 0 until 30; b <- 0 until 30
      if a < b && ((a * 31 + b * 17) % 7) < 2
    } yield (a.toLong, b.toLong))
    val adj = edges.toSet
    def linked(x: Long, y: Long) = adj((math.min(x, y), math.max(x, y)))
    val expected = (for {
      a <- 0L until 30L; b <- a + 1 until 30L; c <- b + 1 until 30L
      if linked(a, b) && linked(b, c) && linked(a, c)
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
    val got = Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }

  test("fast-path flags (canonical input + broadcast degrees) match the general path") {
    import spark.implicits._
    // canonical input: distinct (a, b) with a < b — the coOccurrenceEdges
    // output contract the assumeCanonical flag encodes
    val edges = (for {
      a <- 0 until 40; b <- 0 until 40
      if a < b && ((a * 13 + b * 29) % 11) < 3
    } yield (a.toLong, b.toLong)).toDF("s", "d")
    val general = Graph.triangleCount(edges, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Graph.triangleCount(edges, "s", "d",
        assumeCanonical = true, broadcastDegrees = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === general)
    assert(fast.nonEmpty)
    // the broadcast flag must actually plan broadcast stamp joins
    val plan = Graph.triangleCount(edges, "s", "d",
        assumeCanonical = true, broadcastDegrees = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"degree stamps must broadcast under the flag:\n$plan")
  }
}
