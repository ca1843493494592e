package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {

  private def brute(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val a = df.select(col("id").as("id_a"), col("s").as("sa"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
  }

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    FuzzyJoin.editDistanceJoin(df, "s", "id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bruteSet(df: org.apache.spark.sql.DataFrame, k: Int) =
    brute(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("finds substitution, insertion and deletion neighbors; skips far pairs") {
    import spark.implicits._
    val d = Seq(
      1L -> "kitten", 2L -> "sitten",   // 1 substitution
      3L -> "kitte",                    // 1 deletion from kitten
      4L -> "kittens",                  // 1 insertion
      5L -> "xkitten",                  // front insertion: every segment shifts
      6L -> "sitting",                  // 3 from kitten — beyond k=2
      7L -> "completely different"
    ).toDF("id", "s")
    assert(run(d, 2) === bruteSet(d, 2))
    // the front-insertion case is the one naive position-exact banding
    // misses — pin it explicitly
    assert(run(d, 1).contains((1L, 5L, 1L)))
  }

  test("matches brute force exactly on seeded random strings (k=1 and k=2)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val d = (0 until 160).map { i =>
      val len = 3 + rnd.nextInt(8)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString)
    }.toDF("id", "s")
    d.cache(); d.count()
    assert(run(d, 1) === bruteSet(d, 1))
    assert(run(d, 2) === bruteSet(d, 2))
    d.unpersist()
  }

  test("short strings (below k+1 chars) still join correctly") {
    import spark.implicits._
    val d = Seq(1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "abc", 5L -> "",
      6L -> "").toDF("id", "s")
    assert(run(d, 2) === bruteSet(d, 2))
    // the empty-empty pair exercises the l=0 partner-length bucket
    assert(run(d, 2).contains((5L, 6L, 0L)))
  }

  test("identical strings pair at distance 0; duplicates do not explode pairs") {
    import spark.implicits._
    val d = Seq(1L -> "same text", 2L -> "same text", 3L -> "same text")
      .toDF("id", "s")
    val out = run(d, 2)
    assert(out === Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("candidate generation never builds a cartesian product") {
    import spark.implicits._
    val d = (0 until 50).map(i => (i.toLong, s"string number $i")).toDF("id", "s")
    val plan = FuzzyJoin.editDistanceJoin(d, "s", "id", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay an equi-join pipeline:\n$plan")
  }
}
