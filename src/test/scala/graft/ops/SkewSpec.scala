package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted aggregation equals plain groupBy on a skewed key") {
    import spark.implicits._
    // 10k rows on hot key, a few on others
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"k${i % 5}", i.toDouble))).toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), salts = 8, valueCol = "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum($"v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === plain(k)._2, k)
      assert(math.abs(s - plain(k)._1) < 1e-6, k)
    }
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => "hot") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "fv")
    val dim = Seq(("hot", 1), ("a", 2), ("b", 3), ("z", 9)).toDF("k", "dv")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() === plain.count())
    assert(salted.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      plain.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}
