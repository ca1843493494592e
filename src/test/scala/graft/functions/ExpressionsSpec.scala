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

  test("vec_l2 matches the sequential-fold reference and handles edge shapes") {
    import spark.implicits._
    val df = (1 to 50).map { i =>
      (Seq.tabulate(64)(d => ((i * 31 + d * 7) % 97 / 97.0f) - 0.5f),
        Seq.tabulate(64)(d => ((i * 17 + d * 13) % 89 / 89.0f) - 0.5f))
    }.toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
      GraftFunctions.vec_l2(col("a"), col("b")).as("native")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      var ss = 0.0
      (0 until 64).foreach { d =>
        val diff = a(d).toDouble - b(d).toDouble; ss += diff * diff
      }
      // exact: the codegen loop folds in the same order as this reference
      assert(r.getDouble(2) === math.sqrt(ss))
    }
    // identical vectors are at distance zero; null propagates
    val edge = Seq((Seq(1.0f, 2.0f), Option(Seq(1.0f, 2.0f))), (Seq(1.0f, 2.0f), None))
      .toDF("a", "b")
      .select(GraftFunctions.vec_l2(col("a"), col("b")).as("d")).collect()
    assert(edge(0).getDouble(0) === 0.0)
    assert(edge(1).isNullAt(0))
  }

  test("vector kernels yield NULL on mismatched lengths and null elements, never a prefix metric (round 16)") {
    import spark.implicits._
    // mismatched dimensions: a truncated prefix L2 is systematically
    // SMALLER, so a corrupt-dimension row would silently win a top-k
    val mm = Seq(
      (1, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (2, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("id", "a", "b")
      .select(col("id"),
        GraftFunctions.vec_cosine(col("a"), col("b")).as("c"),
        GraftFunctions.vec_l2(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(!mm(0).isNullAt(1) && !mm(0).isNullAt(2))
    assert(mm(1).isNullAt(1) && mm(1).isNullAt(2),
      "mismatched dimensions must be NULL, not a prefix metric")
    // a null ELEMENT reads as 0.0 through ArrayData without isNullAt —
    // must be NULL like the zip_with + aggregate HOF form
    val ne = Seq((Seq(Option(1.0), None, Option(3.0)),
        Seq(Option(1.0), Option(2.0), Option(3.0)))).toDF("a", "b")
      .select(GraftFunctions.vec_cosine(col("a"), col("b")).as("c"),
        GraftFunctions.vec_l2(col("a"), col("b")).as("d")).collect()
    assert(ne(0).isNullAt(0) && ne(0).isNullAt(1),
      "null elements must propagate to NULL")
    // signature-overlap kernel: same contract
    val ec = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(GraftFunctions.array_eq_count(col("a"), col("b"))).collect()
    assert(ec(0).isNullAt(0), "mismatched signature lengths must be NULL")
    // PQ kernels refuse codebook mismatches with a pointed message
    // instead of unsafe out-of-bounds reads (silent garbage) or AIOOBE
    val pq = intercept[Exception] {
      Seq((Seq(0.toByte, 0.toByte), Seq.fill(16)(1.0))).toDF("c", "t")
        .select(org.apache.spark.sql.graft.bridge.column(PqAdcSum(
          org.apache.spark.sql.graft.bridge.expression(col("c")),
          org.apache.spark.sql.graft.bridge.expression(col("t")),
          ksub = 4)).as("s")).collect()
    }
    def msgs(ex: Throwable): Seq[String] =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
    assert(msgs(pq).exists(_.contains("codebook mismatch")), msgs(pq))
    // SQL arity errors are analysis-time and name the function
    GraftFunctions.register(spark)
    Seq((Seq(1.0), Seq(1.0))).toDF("a", "b").createOrReplaceTempView("vk_in")
    val ar = intercept[Exception] {
      spark.sql("SELECT vec_cosine(a) FROM vk_in").collect()
    }
    assert(msgs(ar).exists(_.contains("vec_cosine(a, b) takes exactly 2")), msgs(ar))
    val ar2 = intercept[Exception] {
      spark.sql("SELECT rolling_hash('x', 7) FROM vk_in").collect()
    }
    assert(msgs(ar2).exists(_.contains("takes exactly 1")), msgs(ar2))
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

  test("hyperplane_sig equals the aggregate(zip_with) formulation bit-exactly") {
    import spark.implicits._
    val dim = 64; val planes = 12; val seed = 3
    val df = (1 to 80).map { i =>
      (i.toLong, Seq.tabulate(dim)(d => ((i * 31 + d * 7) % 97 / 97.0f) - 0.5f))
    }.toDF("id", "v")
    val coeffs = Similarity.planeCoefficients(seed, planes, dim)
    // the former higher-order-function formulation, recomputed inline
    val hofBits = (0 until planes).map { p =>
      val cs = typedLit(coeffs(p))
      val proj = aggregate(
        zip_with(col("v"), cs, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val rows = df.select(
      GraftFunctions.hyperplane_sig(col("v"), coeffs).as("native"),
      hofBits.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // and it runs inside whole-stage codegen over a codegen source
    // (a local Seq collapses to LocalTableScan, so use range)
    val plan = spark.range(10)
      .select(transform(sequence(lit(1), lit(dim)),
        d => (col("id") + d).cast("float")).as("v"))
      .select(GraftFunctions.hyperplane_sig(col("v"), coeffs))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hyperplanesig") && plan.contains("*(1)"),
      s"no WSCG in:\n$plan")
  }

  test("char_entropy matches a reference implementation, in codegen") {
    import spark.implicits._
    def ref(s: String): Double = {
      val counts = s.getBytes("UTF-8")
        .filter(b => (b >= 'a' && b <= 'z') || b == ' ')
        .groupBy(identity).map { case (b, a) => b -> a.length.toLong }
      val alphabet = ('a' to 'z').map(_.toByte) :+ ' '.toByte
      val total = counts.values.sum
      if (total == 0) 0.0
      else alphabet.foldLeft(0.0) { (h, b) =>
        counts.get(b).fold(h) { c =>
          val p = c.toDouble / total; h - p * math.log(p)
        }
      }
    }
    val inputs = Seq("", "aaaa", "ab", "the quick brown fox", "1234!?", "a1b2")
    val df = inputs.toDF("s")
      .select(col("s"), GraftFunctions.char_entropy(col("s")).as("h"))
    // spark.range is a codegen source: the expression must compile inside a
    // WholeStageCodegen span (local Seqs constant-fold to LocalTableScan)
    val ranged = spark.range(10)
      .select(GraftFunctions.char_entropy(
        concat(lit("doc "), col("id").cast("string"))).as("h"))
    assert(ranged.queryExecution.executedPlan.toString
      .contains("*(1) Project [charentropy"),
      s"no WSCG in:\n${ranged.queryExecution.executedPlan}")
    ranged.collect() // and it must actually execute through codegen
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    inputs.foreach(s => assert(got(s) === ref(s), s"input '$s'"))
    // uniform 2-symbol string: exactly ln(2)
    assert(math.abs(got("ab") - math.log(2)) < 1e-15)
    assert(got("aaaa") === 0.0)   // single symbol: zero entropy
    assert(got("1234!?") === 0.0) // nothing in the alphabet: zero, not NaN
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
