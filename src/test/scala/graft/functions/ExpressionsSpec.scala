package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Similarity

class ExpressionsSpec extends SparkTestBase {

  test("rolling_hash matches a reference implementation and is deterministic") {
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xff))
    val inputs = Seq("", "a", "hello world", "Hello World", "こんにちは", "x" * 1000)
    val got = inputs.toDF("s")
      .select(col("s"), GraftFunctions.rolling_hash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach(s => assert(got(s) === ref(s), s"input '$s'"))
    assert(got("hello world") !== got("Hello World"))
  }

  test("rolling_hash survives codegen (whole-stage) and null input") {
    // spark.range is a codegen source, so the expression must compile
    // inside a WholeStageCodegen stage (no eval fallback, no collapse to
    // LocalTableScan)
    val df = spark.range(100)
      .select(when(col("id") % 10 === 0, lit(null))
        .otherwise(concat(lit("doc-"), col("id"))).as("s"))
      .select(GraftFunctions.rolling_hash(col("s")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [rollinghash"), s"no WSCG in:\n$plan")
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) === 10)
    assert(rows.count(!_.isNullAt(0)) === 90)
  }

  test("vec_cosine equals the higher-order-function cosine bit-exactly") {
    import spark.implicits._
    val df = (1 to 50).map { i =>
      (Seq.tabulate(64)(d => ((i * 31 + d * 7) % 97 / 97.0f) - 0.5f),
        Seq.tabulate(64)(d => ((i * 17 + d * 13) % 89 / 89.0f) - 0.5f))
    }.toDF("a", "b")
    val rows = df.select(
      GraftFunctions.vec_cosine(col("a"), col("b")).as("native"),
      Similarity.cosine(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("SQL registration works") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("abc", Seq(1.0f, 2.0f), Seq(2.0f, 1.0f))).toDF("s", "a", "b")
      .createOrReplaceTempView("exprs_in")
    val r = spark.sql(
      "SELECT rolling_hash(s) AS h, vec_cosine(a, b) AS c FROM exprs_in").collect().head
    assert(r.getLong(0) === "abc".getBytes.foldLeft(0L)((h, b) => h * 1000003L + (b & 0xff)))
    assert(math.abs(r.getDouble(1) - 0.8) < 1e-12)
  }

  test("type errors are rejected at analysis time") {
    import spark.implicits._
    val df = Seq(Tuple1(42)).toDF("n")
    val e = intercept[Exception] {
      df.select(GraftFunctions.rolling_hash(col("n"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
