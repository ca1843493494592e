package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.GraftAggregates.misra_gries
import graft.ops.HeavyHitters

class AggregatesSpec extends SparkTestBase {

  test("misra_gries summary is k-bounded and keeps every guaranteed-heavy item") {
    import spark.implicits._
    // 1000 rows: "hot" 300x, "warm" 150x, tail of 550 distinct singletons;
    // shuffled deterministically and spread over 8 partitions so partial
    // summaries genuinely merge (serialize/deserialize included)
    val rows = new scala.util.Random(7).shuffle(
      (Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
        (0 until 550).map(i => s"tail$i")).toList)
    val df = rows.toDF("item").repartition(8)
    val k = 9
    val summary = df.agg(misra_gries(col("item"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.size <= k)
    // n/(k+1) = 100: hot (300) and warm (150) are guaranteed present,
    // with estimates within the n/(k+1) error bound below truth
    assert(summary.contains("hot") && summary.contains("warm"))
    assert(summary("hot") <= 300 && summary("hot") >= 300 - 100)
    assert(summary("warm") <= 150 && summary("warm") >= 150 - 100)
  }

  test("misra_gries ignores nulls and rejects non-string input") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
    val s = df.agg(misra_gries(col("item"), 4).as("s"))
      .select(explode(col("s")).as("e")).select("e.item", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s === Map("a" -> 2L, "b" -> 1L))
    intercept[Exception] {
      Seq(1, 2).toDF("x").agg(misra_gries(col("x"), 4)).collect()
    }
  }

  test("heavyHitters equals brute-force GROUP BY + HAVING, exactly") {
    import spark.implicits._
    // zipf-ish skew, seeded, 8 partitions, heavy items arriving LAST in
    // input order (the adversarial order for one-pass counters)
    val rnd = new scala.util.Random(11)
    val tail = (0 until 3000).map(_ => s"t${rnd.nextInt(900)}")
    val heavy = Seq.fill(500)("alpha") ++ Seq.fill(260)("beta")
    val df = (tail ++ heavy).toDF("item").repartition(8)
    val denom = 10 // threshold: > 376 of 3760 rows
    val got = HeavyHitters.heavyHitters(df, "item", denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val want = df.groupBy("item").count()
      .crossJoin(df.agg(count(lit(1)).as("n")))
      .filter(col("count") * denom > col("n"))
      .select("item", "count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got === want)
    assert(got.contains("alpha" -> 500L))
  }

  test("heavyHitters refuses a k too small for the support guarantee") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("item")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, "item", supportDenom = 50, k = 10)
    }
  }

  test("count_min: estimates >= exact, exact on a collision-free input, partition-order invariant") {
    import spark.implicits._
    val rows = (Seq.fill(40)("hot") ++ Seq.fill(15)("warm") ++
      (0 until 50).map(i => s"t$i")).toList
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    def run(parts: Int): Map[String, Long] = {
      val items = rows.toDF("item").repartition(parts)
      val probes = exact.keys.toSeq.toDF("item")
      graft.ops.Sketch.cmsEstimates(items, "item", probes, "item",
          depth = 4, width = 4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    val got = run(8)
    // overestimate-only, and with 105 rows vs 4×4096 counters the min
    // over 4 independent rows is overwhelmingly exact — assert the CMS
    // bound est <= exact + n/width-ish slack (here: tiny)
    exact.foreach { case (k, c) =>
      assert(got(k) >= c, s"$k: est ${got(k)} < exact $c")
      assert(got(k) <= c + 2, s"$k: est ${got(k)} too loose vs $c")
    }
    // counters are sums: the sketch — hence every estimate — must be
    // bit-identical under a different partitioning
    assert(run(1) === got)
  }

  test("count_min hash matches SQL xxhash64(concat(item, chr(d+1))) bit-exactly") {
    val item = "tokén"
    (0 until 4).foreach { d =>
      val sqlBucket = spark.sql(
        s"SELECT pmod(xxhash64(concat('$item', chr(${d + 1}))), 2048)")
        .head().getLong(0).toInt
      val jvmBucket = CountMin.bucket(
        item.getBytes(java.nio.charset.StandardCharsets.UTF_8), d, 2048)
      assert(jvmBucket === sqlBucket, s"depth $d")
    }
  }

  test("count_min ignores nulls and rejects non-string input") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("a")).toDF("item")
    val grid = withNulls.agg(
      GraftAggregates.count_min(col("item"), 2, 64).as("g"))
      .head().getSeq[Long](0)
    assert(grid.sum === 4L, "two rows x two depths")
    val bad = Seq(1, 2).toDF("item")
    val e = intercept[Exception] {
      bad.agg(GraftAggregates.count_min(col("item"), 2, 64)).collect()
    }
    assert(e.getMessage.contains("string"))
  }
}
