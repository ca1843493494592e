package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Parity of the native [[SortedPairs]] emitter against the HOF chain it
  * replaced in Graph.coOccurrenceEdges — values AND order identical. */
class SortedPairsSpec extends SparkTestBase {

  private val hof = expr(
    "flatten(transform(__us, (x, i) -> " +
      "transform(slice(__us, i + 2, size(__us) - i - 1), " +
      "y -> struct(x AS u, y AS v))))")

  test("sorted_pairs == the flatten/transform/slice chain on long arrays") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    val rows = (1 to 80).map { i =>
      (i.toLong, Seq.fill(r.nextInt(12))(r.nextLong()).sorted)
    }.toDF("id", "__us")
    val got = rows.select(col("id"), hof.as("h"),
      GraftFunctions.sorted_pairs(col("__us")).as("n")).collect()
    got.foreach { row =>
      assert(row.getSeq[Any](1) === row.getSeq[Any](2), s"id=${row.getLong(0)}")
    }
  }

  test("sorted_pairs on string arrays; empty/singleton emit none; null -> null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "bb", "c"))),
      (2L, Some(Seq.empty[String])),
      (3L, Some(Seq("solo"))),
      (4L, Option.empty[Seq[String]])).toDF("id", "__us")
    val rows = df.select(col("id"), hof.as("h"),
        GraftFunctions.sorted_pairs(col("__us")).as("n"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[Any](1) === rows(0).getSeq[Any](2))
    assert(rows(0).getSeq[Any](2).size === 3)
    assert(rows(1).getSeq[Any](2) === Seq.empty)
    assert(rows(2).getSeq[Any](2) === Seq.empty)
    assert(rows(3).isNullAt(2))
  }

  test("null elements never pair and never NPE") {
    import spark.implicits._
    val df = Seq((1L, Seq(Some(1L), None, Some(3L))),
      (2L, Seq(Option.empty[Long], None))).toDF("id", "__us")
    val rows = df.select(col("id"),
        GraftFunctions.sorted_pairs(col("__us")).as("p"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1))) === Seq((1L, 3L)))
    assert(rows(1).getSeq[Any](1) === Seq.empty)
  }

  test("coOccurrenceEdges still accepts non-long/string unit types (HOF fallback)") {
    import spark.implicits._
    val occ = Seq((1, "a"), (2, "a"), (3, "a"), (1, "b"), (2, "b"))
      .toDF("u", "cell") // INT unit column — the native emitter declines it
    val got = graft.ops.Graph.coOccurrenceEdges(occ, "u", Seq("cell"),
        minCells = 2, maxCellSize = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === Set((1, 2)))
  }

  test("coOccurrenceEdges output is unchanged by the native emitter") {
    import spark.implicits._
    val r = new scala.util.Random(41)
    val occ = (1 to 400).map { _ =>
      (r.nextInt(40).toLong, s"c${r.nextInt(25)}")
    }.toDF("u", "cell")
    val edges = graft.ops.Graph.coOccurrenceEdges(occ, "u", Seq("cell"),
        minCells = 2, maxCellSize = 1000)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // reference: plain self-join pair counting
    val d = occ.distinct()
    val expected = d.as("a")
      .join(d.withColumnRenamed("u", "u2").as("b"), "cell")
      .filter(col("u") < col("u2"))
      .groupBy("u", "u2").count().filter(col("count") >= 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(edges === expected)
    edges.foreach { case (u, v) => assert(u < v) }
  }
}
