package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Bit-parity of the native codegen'd ADC expressions ([[PqAdcTable]],
 * [[PqAdcSum]]) against the interpreted HOF formulation they replaced in
 * pqSearchOver — the oracle replay must not move by one ulp.
 */
class PqAdcSpec extends SparkTestBase {

  private val m = 4
  private val ksub = 16
  private val dsub = 3

  private def randCodebooks(seed: Long): Seq[Seq[Seq[Double]]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(m)(Seq.fill(ksub)(Seq.fill(dsub)(
      math.rint(r.nextDouble() * 1e4) / 1e4)))
  }

  test("pq_adc_table == the transform/aggregate/zip_with HOF chain, bitwise") {
    import spark.implicits._
    val cb = randCodebooks(7)
    val r = new scala.util.Random(11)
    val vecs = (1 to 50).map(i => (i.toLong,
      Seq.fill(m * dsub)(r.nextDouble() * 2 - 1))).toDF("id", "__qv")
    val cbLit = typedlit(cb)
    val qv = col("__qv").cast("array<double>")
    val hof = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(cbLit, s + 1), cw =>
        aggregate(
          zip_with(slice(qv, s * lit(dsub) + lit(1), lit(dsub)), cw,
            (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)))
    val rows = vecs.select(col("id"), flatten(hof).as("h"),
        GraftFunctions.pq_adc_table(qv, cb).as("n"))
      .collect()
    rows.foreach { row =>
      val h = row.getSeq[Double](1)
      val n = row.getSeq[Double](2)
      assert(h.size === m * ksub && n.size === m * ksub)
      h.zip(n).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b), s"entry $i: $a vs $b") }
    }
  }

  test("pq_adc_sum == the aggregate/element_at HOF fold, bitwise") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    // full signed-byte code range, including the -128/+127 boundaries
    val rows = (1 to 80).map { i =>
      val codes = if (i == 1) Seq.fill(m)(-128.toByte)
        else if (i == 2) Seq.fill(m)((ksub - 129).toByte)
        else Seq.fill(m)((r.nextInt(ksub) - 128).toByte)
      val table = Seq.fill(m * ksub)(r.nextDouble() * 10 - 5)
      (i.toLong, codes, table)
    }.toDF("id", "__codes", "flat")
    // the HOF form indexes the UNflattened per-sub tables; rebuild them
    val nested = transform(sequence(lit(0), lit(m - 1)), s =>
      slice(col("flat"), s * lit(ksub) + lit(1), lit(ksub)))
    val hof = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(nested, s + 1),
        element_at(col("__codes"), s + 1).cast("int") + 129))
    val out = rows.select(hof.as("h"),
      GraftFunctions.pq_adc_sum(col("__codes"), col("flat"), ksub).as("n"))
      .collect()
    out.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("pq_encode == the d2/array_min/array_position HOF chain, bitwise") {
    import spark.implicits._
    val cb = randCodebooks(31)
    val r = new scala.util.Random(37)
    // include vectors EQUAL to codewords (exact d2=0 ties at the boundary)
    val vecs = ((1 to 60).map(i => (i.toLong,
        Seq.fill(m * dsub)(r.nextDouble() * 2 - 1))) ++
      Seq((61L, cb.flatMap(_.head).map(identity)),
          (62L, cb.flatMap(_(3)))))
      .toDF("id", "__cv")
    val dim = m * dsub
    val cbLit = typedlit(cb)
    val normLit = typedlit(cb.map(_.map(cw => cw.map(x => x * x).sum)))
    val v = col("__cv").cast("array<double>")
    val d2ss = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(cbLit, s + 1), cw =>
        aggregate(
          zip_with(slice(v, s * lit(dsub) + lit(1), lit(dsub)), cw,
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)))
    val hofCodes = transform(d2ss, d2s =>
      (array_position(d2s, array_min(d2s)).cast("int") - 129).cast("tinyint"))
    val rows = vecs
      .withColumn("h", hofCodes)
      .withColumn("n", GraftFunctions.pq_encode(v, cb))
      .withColumn("hr", sqrt(aggregate(sequence(lit(0), lit(m - 1)),
        lit(0.0), (acc, s) => acc + element_at(element_at(normLit, s + 1),
          element_at(col("h"), s + 1).cast("int") + 129))))
      .withColumn("nr", GraftFunctions.pq_recon_norm(col("n"),
        cb.map(_.map(cw => cw.map(x => x * x).sum))))
      .select("id", "h", "n", "hr", "nr")
      .collect()
    rows.foreach { row =>
      assert(row.getSeq[Byte](1) === row.getSeq[Byte](2), s"id=${row.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(row.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(4)),
        s"rnorm id=${row.getLong(0)}")
    }
    assert(rows.length === 62)
  }

  test("pq_encode: wrong-dim and NULL vectors yield NULL codes") {
    import spark.implicits._
    val cb = randCodebooks(41)
    val df = Seq((1L, Some(Seq.fill(m * dsub - 2)(0.3))),
        (2L, Option.empty[Seq[Double]]))
      .toDF("id", "__cv")
      .select(col("id"), GraftFunctions.pq_encode(
        col("__cv").cast("array<double>"), cb).as("c"))
      .collect()
    assert(df.forall(_.isNullAt(1)))
  }

  test("wrong-dim query vector yields NULL table, like the padded zip") {
    import spark.implicits._
    val cb = randCodebooks(3)
    val short = Seq((1L, Seq.fill(m * dsub - 1)(0.5))).toDF("id", "__qv")
    val row = short.select(GraftFunctions.pq_adc_table(
      col("__qv").cast("array<double>"), cb).as("t")).collect().head
    assert(row.isNullAt(0))
  }

  test("pq_recon_norm: a SHORTER codes row fails instead of a prefix norm") {
    import spark.implicits._
    val norms = randCodebooks(43).map(_.map(cw => cw.map(x => x * x).sum))
    // m-1 codes against an m-sub-space codebook: must raise, not return
    // the systematically smaller √Σ over the first m-1 sub-spaces
    val df = Seq((1L, Seq.fill(m - 1)(0.toByte))).toDF("id", "__codes")
      .select(GraftFunctions.pq_recon_norm(col("__codes"), norms))
    val e = intercept[Exception](df.collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).toSeq
    assert(msgs.exists(_.contains("codebook mismatch")), msgs)
    // interpreted path agrees with codegen
    val ie = intercept[IllegalArgumentException](
      graft.functions.PqReconNorm(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq.fill(m - 1)(0.toByte),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ByteType)),
        norms).eval(null))
    assert(ie.getMessage.contains("codebook mismatch"))
  }

  test("both expressions stay inside whole-stage codegen") {
    import spark.implicits._
    val cb = randCodebooks(5)
    val df = spark.range(4)
      .withColumn("__qv", array((0 until m * dsub).map(d =>
        col("id") * 0.01 + lit(d * 0.1)): _*))
      .withColumn("__codes", typedlit(Seq.fill(m)((-128).toByte)))
      .withColumn("t", GraftFunctions.pq_adc_table(
        col("__qv").cast("array<double>"), cb))
      .withColumn("s", GraftFunctions.pq_adc_sum(col("__codes"), col("t"), ksub))
      .select(sum(col("s")))
    df.collect() // the generated code actually compiles and runs
    val plan = df.queryExecution.executedPlan.toString // AQE final plan
    // the `*(n)` prefix is the WholeStageCodegen marker: the projection
    // computing pqadcsum(pqadctable(...)) must carry it
    val projLine = plan.linesIterator.find(_.contains("pqadcsum"))
    assert(projLine.exists(_.contains("*(")), plan)
  }
}
