package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftAggregates

/**
 * Distributed PCA over an embedding column, built on the one-pass
 * mergeable [[graft.functions.GramMatrix]] aggregate: the cluster reduces
 * the corpus to one d×d Gram/covariance matrix (O(d²) state per task,
 * O(d²) bytes on the shuffle — the N·d² per-row explosion never exists),
 * the d×d eigenproblem is solved on the driver (d-bounded work,
 * independent of corpus size — the standard split for tall-skinny X), and
 * the projection returns to the cluster as a broadcast-style literal
 * matrix applied in a narrow, codegen-friendly map.
 *
 * The eigensolver is cyclic Jacobi rotation (Golub & Van Loan, "Matrix
 * Computations" — public literature): exact enough at d ≤ a few thousand,
 * deterministic given the matrix, no external linear-algebra dependency.
 * Eigenvector sign is fixed by making the largest-|component| positive so
 * projections are reproducible across runs.
 */
object Pca {

  /** Upper-triangle Gram matrix `Σ v·vᵀ` as (i, j, gram) rows —
    * `d*(d+1)/2` rows AFTER aggregation; the explode touches one
    * already-reduced array, never corpus rows. */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.agg(GraftAggregates.gram_matrix(col(vecCol), dim).as("__g"))
      .select(explode(col("__g")).as("__e"))
      .select(col("__e.i").as("i"), col("__e.j").as("j"),
        col("__e.gram").as("gram"))

  /** Mean-centered covariance `(Σ v·vᵀ − n·μμᵀ) / (n−1)` as (i, j, cov)
    * rows, from the same single pass (gram + per-dim sums + count ride
    * one aggregation). */
  def covMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val sums = (0 until dim).map(i =>
      sum(element_at(col(vecCol), i + 1).cast("double")).as(s"__s$i"))
    val agg = df.agg(GraftAggregates.gram_matrix(col(vecCol), dim).as("__g"),
      (count(when(col(vecCol).isNotNull, 1)).as("__n") +: sums): _*)
    // one aggregated row: explode the triangle, subtract n·μᵢμⱼ
    val meanArr = array((0 until dim).map(i => col(s"__s$i") / col("__n")): _*)
    // the sample covariance needs n >= 2; CASE short-circuits, so the
    // division never runs on the failing branch — the raise_error fires
    // instead of an opaque ANSI divide-by-zero
    val covExpr = (col("__e.gram")
      - col("__n") * element_at(col("__mu"), col("__e.i") + 1)
        * element_at(col("__mu"), col("__e.j") + 1)) / (col("__n") - 1)
    agg.withColumn("__mu", meanArr)
      .select(col("__n"), col("__mu"), explode(col("__g")).as("__e"))
      .select(col("__e.i").as("i"), col("__e.j").as("j"),
        when(col("__n") >= 2, covExpr)
          .otherwise(raise_error(
            lit("covMatrix requires at least 2 non-null vectors")))
          .as("cov"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix given as its
    * upper triangle (row-major). Returns (eigenvalues desc, eigenvectors
    * as rows, matching order), signs fixed. Driver-side: O(d³) per sweep,
    * d-bounded — never corpus-bounded. */
  def eigenSym(upper: Array[Double], dim: Int,
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    require(upper.length == dim * (dim + 1) / 2,
      s"upper triangle of dim=$dim needs ${dim * (dim + 1) / 2} values, got ${upper.length}")
    val a = Array.ofDim[Double](dim, dim)
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      a(i)(j) = upper(k); a(j)(i) = upper(k); k += 1
    }
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a, dim)
    val scale = math.max(1.0, (0 until dim).map(i => math.abs(a(i)(i))).max)
    while (sweep < maxSweeps && off > tol * scale) {
      for (p <- 0 until dim - 1; q <- p + 1 until dim if math.abs(a(p)(q)) > 0) {
        // 2x2 symmetric Schur rotation zeroing a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) match {
          case 0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var r = 0
        while (r < dim) {
          val arp = a(r)(p); val arq = a(r)(q)
          a(r)(p) = c * arp - s * arq
          a(r)(q) = s * arp + c * arq
          r += 1
        }
        r = 0
        while (r < dim) {
          val apr = a(p)(r); val aqr = a(q)(r)
          a(p)(r) = c * apr - s * aqr
          a(q)(r) = s * apr + c * aqr
          val vrp = v(r)(p); val vrq = v(r)(q)
          v(r)(p) = c * vrp - s * vrq
          v(r)(q) = s * vrp + c * vrq
          r += 1
        }
      }
      off = offDiag(a, dim)
      sweep += 1
    }
    require(off <= tol * scale * 1e6,
      s"Jacobi failed to converge in $maxSweeps sweeps (off=$off)")
    val order = (0 until dim).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(dim)(r => v(r)(i))
      // sign convention: largest-|component| positive
      val m = col.indices.maxBy(r => (math.abs(col(r)), -r))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]], dim: Int): Double = {
    var s = 0.0
    for (i <- 0 until dim - 1; j <- i + 1 until dim) s += math.abs(a(i)(j))
    s
  }

  /** Fitted projection: top-`k` eigenvectors of the corpus Gram matrix. */
  final case class PcaModel(dim: Int, eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Fit on the cluster (one gram aggregation — the only corpus pass),
    * solve on the driver (d-bounded). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    val triLen = dim * (dim + 1) / 2
    val row = df.agg(GraftAggregates.gram_matrix(col(vecCol), dim).as("g"))
      .selectExpr("transform(g, x -> x.gram) AS flat").head()
    val upper = row.getSeq[Double](0).toArray
    require(upper.length == triLen, s"gram returned ${upper.length} cells")
    val (values, vectors) = eigenSym(upper, dim)
    PcaModel(dim, values.take(k), vectors.take(k))
  }

  /** Project the vector column onto the model's components — a narrow
    * per-row map: k dot products against literal coefficient arrays via
    * codegen'd higher-order functions; no shuffle, no UDF. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val comps: Seq[Column] = model.components.toIndexedSeq.map { comp =>
      Similarity.dot(col(vecCol).cast("array<double>"),
        typedlit(comp.toIndexedSeq))
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
