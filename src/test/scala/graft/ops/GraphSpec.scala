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
}
