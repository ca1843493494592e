package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def vecsDF(vs: Seq[Array[Float]], parts: Int = 4) =
    spark.createDataset(vs.map(_.toSeq)).toDF("embedding").repartition(parts)

  test("gramMatrix equals brute-force sum of outer products, across partitionings") {
    val rnd = new scala.util.Random(3)
    val d = 5
    val vs = Seq.fill(40)(Array.fill(d)(rnd.nextFloat() * 2 - 1))
    for (parts <- Seq(1, 3, 7)) {
      val got = Pca.gramMatrix(vecsDF(vs, parts), "embedding", d)
        .orderBy("i", "j").collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      for (i <- 0 until d; j <- i until d) {
        val want = vs.map(v => v(i).toDouble * v(j).toDouble).sum
        assert(math.abs(got((i, j)) - want) < 1e-9,
          s"parts=$parts cell ($i,$j): ${got((i, j))} vs $want")
      }
      assert(got.size == d * (d + 1) / 2)
    }
  }

  test("gramMatrix skips null vectors; wrong-length vectors fail loudly") {
    val ok = Seq(Seq(1f, 2f), null, Seq(3f, 4f))
    val got = Pca.gramMatrix(
        spark.createDataset(ok).toDF("embedding"), "embedding", 2)
      .orderBy("i", "j").collect().map(_.getDouble(2))
    // [[1,2],[3,4]]: g00=1+9=10, g01=2+12=14, g11=4+16=20
    assert(got.toSeq == Seq(10.0, 14.0, 20.0))
    val bad = spark.createDataset(Seq(Seq(1f, 2f, 3f))).toDF("embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Pca.gramMatrix(bad, "embedding", 2).collect()
    }
    assert(e.getMessage.contains("length-3") || e.getCause != null)
  }

  test("covMatrix equals the textbook centered covariance") {
    val rnd = new scala.util.Random(11)
    val d = 4
    val vs = Seq.fill(30)(Array.fill(d)(rnd.nextFloat() * 3))
    val got = Pca.covMatrix(vecsDF(vs), "embedding", d)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val n = vs.length
    val mu = (0 until d).map(i => vs.map(_(i).toDouble).sum / n)
    for (i <- 0 until d; j <- i until d) {
      val want = vs.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / (n - 1)
      assert(math.abs(got((i, j)) - want) < 1e-9, s"cell ($i,$j)")
    }
  }

  test("covMatrix on fewer than 2 vectors fails loudly, not divide-by-zero") {
    val one = spark.createDataset(Seq(Seq(1f, 2f))).toDF("embedding")
    val e = intercept[Exception] {
      Pca.covMatrix(one, "embedding", 2).collect()
    }
    assert(e.getMessage.contains("at least 2") ||
      Option(e.getCause).exists(_.getMessage.contains("at least 2")))
  }

  test("eigenSym solves a known symmetric system") {
    // [[2,1],[1,2]] has eigenvalues 3 (v=[1,1]/√2) and 1 (v=[1,-1]/√2)
    val (values, vectors) = Pca.eigenSym(Array(2.0, 1.0, 2.0), 2)
    assert(math.abs(values(0) - 3.0) < 1e-10)
    assert(math.abs(values(1) - 1.0) < 1e-10)
    val s = 1.0 / math.sqrt(2)
    assert(vectors(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-10 })
    assert(vectors(1).zip(Array(s, -s)).forall { case (a, b) => math.abs(a - b) < 1e-10 })
  }

  test("eigenSym on random symmetric matrices: residual, orthonormality, order, sign") {
    val rnd = new scala.util.Random(5)
    val d = 8
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian(); a(i)(j) = x; a(j)(i) = x
    }
    val upper = (for (i <- 0 until d; j <- i until d) yield a(i)(j)).toArray
    val (values, vectors) = Pca.eigenSym(upper, d)
    // descending eigenvalues
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    for (k <- 0 until d) {
      val v = vectors(k)
      // residual ||Av - λv||
      val av = (0 until d).map(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      val res = math.sqrt((0 until d).map(i => math.pow(av(i) - values(k) * v(i), 2)).sum)
      assert(res < 1e-8, s"eigenpair $k residual $res")
      // unit norm + sign convention
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-10)
      assert(v(v.indices.maxBy(i => (math.abs(v(i)), -i))) > 0)
      // orthogonal to the others
      for (l <- k + 1 until d)
        assert(math.abs(v.zip(vectors(l)).map { case (x, y) => x * y }.sum) < 1e-8)
    }
  }

  test("fit + project: components capture a planted dominant direction") {
    // points spread strongly along u=[1,1,0,0]/√2, tiny noise elsewhere
    val rnd = new scala.util.Random(9)
    val s = 1.0 / math.sqrt(2)
    val vs = Seq.fill(200) {
      val t = rnd.nextGaussian() * 10
      Array((t * s + rnd.nextGaussian() * 0.01).toFloat,
        (t * s + rnd.nextGaussian() * 0.01).toFloat,
        (rnd.nextGaussian() * 0.01).toFloat,
        (rnd.nextGaussian() * 0.01).toFloat)
    }
    val df = vecsDF(vs)
    val model = Pca.fit(df, "embedding", 4, 2)
    // top component aligns with the planted direction (sign-fixed)
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - s) < 0.01 && math.abs(math.abs(c0(1)) - s) < 0.01)
    assert(math.abs(c0(2)) < 0.01 && math.abs(c0(3)) < 0.01)
    assert(model.eigenvalues(0) > 100 * model.eigenvalues(1))
    // projection = literal dot products, reproducible and narrow
    val proj = Pca.project(df, "embedding", model)
    val row = proj.select("embedding", "pca").head()
    val emb = row.getSeq[Float](0)
    val pca = row.getSeq[Double](1)
    val want = model.components.map(c =>
      c.zip(emb).map { case (a, b) => a * b.toDouble }.sum)
    assert(pca.zip(want).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(proj.count() == 200)
  }
}
