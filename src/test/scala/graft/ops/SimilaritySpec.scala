package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private lazy val vecs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),  // close to 0
      (2L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
      (3L, Seq(-1.0f, 0.0f, 0.0f)), // opposite of 0
      (4L, Seq(0.7f, 0.7f, 0.0f))   // between 0 and 2
    ).toDF("vec_id", "embedding")
  }

  test("cosine math") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().head.getDouble(0)
    val expect = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val r = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, k = 3)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 4L, 2L))
    assert(r.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    assert(r.head.getAs[Double]("cosine_sim") > 0.99)
  }

  test("hyperplane signature: identical vectors share buckets, plan stays expression-only") {
    val sigs = vecs.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding"), dim = 3, planes = 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // opposite vectors flip every plane bit
    assert((sigs(0L) ^ sigs(3L)) === 0xFFL)
    // close vectors agree on most planes
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(1L)) <=
      java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)))
  }

  test("lshTopK returns ranked neighbors drawn from shared buckets") {
    val r = Similarity.lshTopK(
      vecs.filter(col("vec_id") === 0), vecs, k = 2, dim = 3, planes = 4, tables = 4)
      .collect()
    assert(r.nonEmpty)
    // best candidate when found must be vec 1
    assert(r.filter(_.getAs[Int]("rank") == 1)
      .forall(_.getAs[Long]("neighbor_id") == 1L))
  }

  test("ivfTopK recall: probing enough cells recovers the exact top-1") {
    import spark.implicits._
    // bigger corpus so k-means has structure: 3 separated clusters
    val corpus = (0 until 300).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d == c) 1.0f else 0.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + ((i * 31 + d * 7) % 13) / 130.0f }.toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    val ivf = Similarity.ivfTopK(queries, corpus, k = 3, nCells = 6, nProbe = 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    // top-1 from the probed cells matches brute force for clustered data
    assert(ivf === exact)
  }

  test("cosineNearDupPairs finds the close pair only at high threshold") {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("semDedup: within-cluster dups drop, cross-cluster near-pairs survive") {
    import spark.implicits._
    // two obvious clusters around +x and +y; 5/6 are dups of 0/1 within
    // the +x cell; 2/7 land in the +y cell with 7 a dup of 2; 3 is its
    // own far-out singleton pair-free row
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.95f, 0.05f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 2.0f, 4.0f)), // +y-leaning far-out singleton
      (5L, Seq(0.99f, 0.01f, 0.0f)),
      (6L, Seq(0.97f, 0.03f, 0.0f)),
      (7L, Seq(0.02f, 0.98f, 0.0f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (200L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")

    val assigned = Similarity.assignToCentroids(corpus, centroids)
    val byCluster = assigned.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cluster_id")).toMap
    // 3 leans +y (cos 2/sqrt(21) vs -1/sqrt(21)): strictly closer to 200
    assert(byCluster === Map(0L -> 100L, 1L -> 100L, 5L -> 100L, 6L -> 100L,
      2L -> 200L, 7L -> 200L, 3L -> 200L))

    // candidate pairs never cross cells and are a subset of brute force
    val pairs = Similarity.semDedupPairs(assigned, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineNearDupPairs(corpus, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(brute))
    assert(pairs.forall { case (a, b) => byCluster(a) === byCluster(b) })
    assert(pairs === Set((0L, 1L), (0L, 5L), (0L, 6L), (1L, 5L), (1L, 6L),
      (5L, 6L), (2L, 7L)))

    // kept = min-id representative per component + the pair-free row
    val kept = Similarity.semDedup(corpus, centroids, threshold = 0.99)
    assert(kept.columns.contains("cluster_id"))
    assert(kept.select("vec_id").as[Long].collect().toSet === Set(0L, 2L, 3L))
  }

  test("semDedup pair join is an equi-join on cluster_id, never cartesian") {
    import spark.implicits._
    val assigned = Similarity.assignToCentroids(vecs, vecs.filter(col("vec_id") < 2))
    val plan = Similarity.semDedupPairs(assigned, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("groupedConnectedComponents matches the iterative CC on cell-local pairs") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val assigned = Similarity.assignToCentroids(e, e.filter(col("vec_id") < 8))
    val pairs = Similarity.semDedupPairs(assigned, 0.35)
    val iterative = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val grouped = Dedup.groupedConnectedComponents(pairs, "cluster_id")
      .as[(Long, Long)].collect().toMap
    assert(grouped.nonEmpty)
    assert(grouped === iterative)
  }

  test("semDedupPairs cell-size cap: sub-cell split keeps exact dups paired") {
    import spark.implicits._
    // one cell of 6: ids 0/1 exact dups, 2/3 exact dups, 4/5 near 0 —
    // with cap 2 the cell splits into 3 sub-cells by embedding hash, so
    // exact-dup pairs (identical embeddings, identical hash) MUST survive
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.9f, 0.1f)),
      (4L, Seq(0.95f, 0.05f)), (5L, Seq(0.85f, 0.15f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val assigned = Similarity.assignToCentroids(corpus, centroids)
    val uncapped = Similarity.semDedupPairs(assigned, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Similarity.semDedupPairs(assigned, 0.9, maxCellSize = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.contains((0L, 1L)), "exact dups 0/1 hash to the same sub-cell")
    assert(capped.contains((2L, 3L)), "exact dups 2/3 hash to the same sub-cell")
    // the capped semDedup still drops one of each exact-dup pair
    val kept = Similarity.semDedup(corpus, centroids, threshold = 0.9,
      maxCellSize = 2).select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(3L))
    assert(kept.contains(0L) && kept.contains(2L))
  }

  test("assignToCentroids broadcast fallback matches the unrolled path") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 8)
    val unrolled = Similarity.assignToCentroids(e, cents)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    val saved = Similarity.UnrolledAssignLimit
    val fallback = try {
      Similarity.UnrolledAssignLimit = 1L // force the broadcast-join shape
      Similarity.assignToCentroids(e, cents)
        .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    } finally Similarity.UnrolledAssignLimit = saved
    assert(fallback.size === unrolled.size)
    assert(fallback === unrolled)
  }

  test("assignToCentroids null/empty embeddings get null cluster_id and survive semDedup") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Some(Seq(1.0f, 0.0f))),
      (1L, Some(Seq(1.0f, 0.0f))),
      (2L, None),
      (3L, Some(Seq.empty[Float]))
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val assigned = Similarity.assignToCentroids(corpus, centroids)
    val byId = assigned.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("cluster_id"))).toMap
    assert(byId(0L).isDefined && byId(1L).isDefined)
    assert(byId(2L).isEmpty, "null embedding => null cluster_id")
    assert(byId(3L).isEmpty, "empty embedding => null cluster_id")
    // null-cell rows are never compared and always kept
    val kept = Similarity.semDedup(corpus, centroids, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(0L, 2L, 3L))
  }

  test("quantizeInt8: round-trip error bounded by scale/2, extremes hit ±127") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.0f, -1.0f, 0.5f, 0.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero: scale 0, codes 0
    ).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getSeq[Int](3))).toMap
    val (s0, q0) = rows(0L)
    assert(s0 === 1.0 / 127.0)
    assert(q0 === Seq(127, -127, 64, 0)) // 0.5/(1/127) = 63.5 -> HALF_UP 64
    q0.zip(Seq(1.0, -1.0, 0.5, 0.0)).foreach { case (q, x) =>
      assert(math.abs(q * s0 - x) <= s0 / 2 + 1e-12)
    }
    assert(rows(1L) === ((0.0, Seq(0, 0, 0, 0))))
  }

  test("kmeansStep: per-dimension means of the assigned members") {
    // centroids 0 and 2 (orthogonal axes): members of 0 = {0,1,4 is closer
    // to? cos(4,0)=0.707, cos(4,2)=0.707 -> tie broken by lower cluster id
    // = 0}, 3 is opposite of 0 but still closer to 0 than to 2 (0 > -1? no:
    // cos(3,0) = -1, cos(3,2) = 0 -> cluster 2)
    val got = Similarity.kmeansStep(vecs, vecs.filter(col("vec_id") isin (0L, 2L)))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    // cluster 0 members: 0,1,4 -> dim0 mean = (1.0+0.9+0.7)/3
    assert(got((0L, 0)) === ((math.round((1.0f + 0.9f + 0.7f).toDouble / 3 * 1e4) / 1e4, 3L)))
    // cluster 2 members: 2,3 -> dim0 mean = (0.0 + -1.0)/2 = -0.5
    assert(got((2L, 0)) === ((-0.5, 2L)))
    assert(got((2L, 1)) === ((0.5, 2L)))
    // every (cluster, dim) row carries the member count; 3 dims per cluster
    assert(got.keySet === Set((0L, 0), (0L, 1), (0L, 2), (2L, 0), (2L, 1), (2L, 2)))
  }

  test("broadcast hint present in brute-force plan (corpus scanned once, no shuffle on big side)") {
    val plan = Similarity.bruteForceTopK(vecs.limit(2), vecs, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in plan:\n$plan")
  }

  test("kmeansTrain: one iteration == kmeansStep; separated groups converge to group means") {
    import spark.implicits._
    // two tight clusters around orthogonal directions
    def vec(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (v, d) => v + (if (d == i % 4) 0.01f else 0f) }
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val vecs = ((0 until 10).map(i => (i.toLong, vec(a, i))) ++
      (10 until 24).map(i => (i.toLong, vec(b, i))))
      .toDF("vec_id", "embedding")
    val init = vecs.filter(col("vec_id").isin(0L, 10L))
    val one = graft.ops.Similarity.kmeansTrain(vecs, init, iters = 1)
      .orderBy("cluster_id", "dim").collect().toSeq
    val step = graft.ops.Similarity.kmeansStep(vecs, init)
      .orderBy("cluster_id", "dim").collect().toSeq
    assert(one === step)
    val trained = graft.ops.Similarity.kmeansTrain(vecs, init, iters = 3)
    val sizes = trained.select("cluster_id", "n_vecs").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(0L -> 10L, 10L -> 14L))
    // centroid of cluster 0 dominated by dim 0, cluster 10 by dim 1
    val c0 = trained.filter(col("cluster_id") === 0L).orderBy("dim")
      .collect().map(_.getDouble(2))
    val c1 = trained.filter(col("cluster_id") === 10L).orderBy("dim")
      .collect().map(_.getDouble(2))
    assert(c0(0) > 0.9 && c0(1) < 0.1)
    assert(c1(1) > 0.9 && c1(0) < 0.1)
  }

  test("marginMinePairs: equals an independent driver-side reference; hubs are suppressed") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(8)(rng.nextGaussian().toFloat)
    val aVecs = (0L until 12L).map(i => (i, vec()))
    // B: near-copies of some A vectors (true pairs), plus a HUB close to
    // the centroid of everything (should score high cosine with many A's
    // but a margin near 1)
    val centroid = {
      val c = new Array[Float](8)
      aVecs.foreach(v => (0 until 8).foreach(d => c(d) += v._2(d)))
      c.map(_ / aVecs.size)
    }
    val bVecs = aVecs.take(4).map { case (i, v) =>
      (100L + i, v.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    } ++ Seq((200L, centroid)) ++ (0 until 6).map(j => (300L + j, vec()))
    val a = aVecs.toDF("vec_id", "embedding")
    val b = bVecs.toDF("vec_id", "embedding")
    val k = 3
    val got = graft.ops.Similarity.marginMinePairs(a, b, k = k, minMargin = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

    // independent reference
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      (0 until 8).foreach { d =>
        dot += x(d).toDouble * y(d); nx += x(d).toDouble * x(d); ny += y(d).toDouble * y(d)
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val scores = for { (ia, va) <- aVecs; (ib, vb) <- bVecs } yield (ia, ib, cos(va, vb))
    def topAvg(xs: Seq[Double]): Double = {
      val t = xs.sorted.reverse.take(k); t.sum / t.size
    }
    val avgA = aVecs.map { case (ia, _) =>
      ia -> topAvg(scores.filter(_._1 == ia).map(_._3)) }.toMap
    val avgB = bVecs.map { case (ib, _) =>
      ib -> topAvg(scores.filter(_._2 == ib).map(_._3)) }.toMap
    val expect = aVecs.flatMap { case (ia, _) =>
      val best = scores.filter(_._1 == ia).maxBy(s => (s._3, -s._2))
      val margin = best._3 / ((avgA(ia) + avgB(best._2)) / 2)
      if (BigDecimal(margin).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 1.05)
        Some((ia, best._2,
          BigDecimal(best._3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(margin).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }
    assert(got.sortBy(_._1).toSeq === expect.sortBy(_._1))
    // every planted near-copy pair must survive, matched to its source
    (0L until 4L).foreach { i =>
      assert(got.exists(r => r._1 == i && r._2 == 100L + i), s"planted pair $i")
    }
    // the hub is nobody's kept match: its margin is ~1 by construction
    assert(!got.exists(_._2 == 200L), "hub must be margin-suppressed")
  }

  test("hardNegatives excludes positives before the rank cut") {
    import spark.implicits._
    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),   // the known positive: most similar, excluded
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.8f, 0.2f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pos = Seq((100L, 0L)).toDF("query_id", "positive_id")
    val got = Similarity.hardNegatives(q, corpus, pos, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    // the positive (id 0) never appears, even though it ranks first by
    // similarity — exclusion happens before the cut, so rank 1-2 are the
    // two hardest true negatives
    assert(got.toSeq === Seq((1, 1L), (2, 2L)))
  }

  test("mmrSelect defers an exact duplicate of the top hit when λ < 0.5") {
    import spark.implicits._
    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),  // top hit (rel = 1, tie with id 1 → id asc)
      (1L, Seq(1.0f, 0.0f)),  // exact duplicate of 0
      (2L, Seq(0.8f, 0.6f))   // rel = 0.8, diverse
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(q, corpus, poolSize = 3, k = 3,
      lambda = 0.4).orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    // round 2: dup scores 0.4·1 − 0.6·1 = −0.2, diverse 0.4·0.8 − 0.6·0.8
    // = −0.16 → the duplicate drops to rank 3
    assert(got.toSeq === Seq((1, 0L), (2, 2L), (3, 1L)))
  }

  test("mmrSelect: negative cosine to the selected set is a bonus, not floored at 0") {
    import spark.implicits._
    val q = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Seq(0.8f, 0.0f, -0.6f)),              // rel 0.8 → picked first
      (1L, Seq(0.0f, 0.0f, 1.0f)),               // rel 0, sim to 0 = −0.6
      (2L, Seq(0.3f, math.sqrt(0.91).toFloat, 0.0f)) // rel 0.3, sim ≈ 0.24
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(q, corpus, poolSize = 3, k = 2,
      lambda = 0.7).orderBy("rank").collect()
      .map(_.getAs[Long]("neighbor_id"))
    // true round-2 scores: id1 = 0 − 0.3·(−0.6) = 0.18 beats
    // id2 ≈ 0.21 − 0.3·0.24 ≈ 0.138; a zero-floored penalty would flip it
    assert(got.toSeq === Seq(0L, 1L))
  }

  test("mmrSelect matches an independent driver-side greedy reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val dim = 8
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val lambda = 0.7; val pool = 10; val k = 5
    val got = Similarity.mmrSelect(
        corpusDf.filter(col("vec_id") < 3), corpusDf, pool, k, lambda)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("mmr_score")))
      .sortBy(t => (t._1, t._2)).toSeq

    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (0L until 3L).flatMap { qid =>
      val qv = corpus(qid.toInt)._2
      val cands = corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, v, cos(qv, v)) }
        .sortBy(t => (-t._3, t._1)).take(pool).toArray
      var selected = List.empty[Int]
      (1 to k).map { rank =>
        val remaining = cands.indices.filterNot(selected.contains)
        val best = remaining.minBy { i =>
          val pen = if (selected.isEmpty) 0.0
            else selected.map(s => cos(cands(i)._2, cands(s)._2)).max
          val score = if (selected.isEmpty) lambda * cands(i)._3
            else lambda * cands(i)._3 - (1 - lambda) * pen
          (-score, cands(i)._1)
        }
        val pen = if (selected.isEmpty) 0.0
          else selected.map(s => cos(cands(best)._2, cands(s)._2)).max
        val score = if (selected.isEmpty) lambda * cands(best)._3
          else lambda * cands(best)._3 - (1 - lambda) * pen
        selected ::= best
        (qid, rank, cands(best)._1, r4(score))
      }
    }
    assert(got === expect.sortBy(t => (t._1, t._2)))
  }

  test("rrfFuse: both-list docs outrank single-list docs; ties break on doc id; lists stay per-query") {
    import spark.implicits._
    // q1: doc 10 is rank 1 in A and rank 3 in B; doc 11 only in A (rank 2);
    // doc 12 only in B (rank 1); doc 13 only in B (rank 2)
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 12L, 1), (1L, 13L, 2), (1L, 10L, 3), (2L, 21L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), k = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // q1 scores: 10 -> 1/61 + 1/63 = 0.032266...; 12 -> 1/61 = 0.016393;
    // 11 -> 1/62 = 0.016129; 13 -> 1/62 = 0.016129 (tie with 11 -> id asc)
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ===
      Seq((1, 10L), (2, 12L), (3, 11L), (4, 13L)))
    val s10 = got.find(t => t._1 == 1L && t._3 == 10L).get._4
    assert(math.abs(s10 - (1.0 / 61 + 1.0 / 63)) < 1e-6)
    // q2: fusion never leaks across queries
    assert(got.filter(_._1 == 2L).map(_._3).toSet === Set(20L, 21L))
  }

  test("silhouette: geometry fixture — on-centroid 1, equidistant 0, ties to lowest id; nulls dropped") {
    import spark.implicits._
    val r = math.sqrt(0.5).toFloat
    val vecs = Seq(
      (0L, Array(1f, 0f)),        // == centroid 0: a=0, b=1, s=1
      (1L, Array(0f, 1f)),        // == centroid 1: s=1, cluster 1
      (2L, Array(r, r)),          // equidistant: a=b -> s=0, tie -> cluster 100
      (3L, null.asInstanceOf[Array[Float]])) // excluded
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, Array(1f, 0f)), (101L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.silhouette(vecs, cents)
      .select("vec_id", "cluster_id", "silhouette")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got(0)._2 === 100L && math.abs(got(0)._3 - 1.0) < 1e-9)
    assert(got(1)._2 === 101L && math.abs(got(1)._3 - 1.0) < 1e-9)
    assert(got(2)._2 === 100L && math.abs(got(2)._3) < 1e-9)
  }

  test("silhouette: broadcast-join fallback matches the unrolled path exactly") {
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 31 + d * 17) % 23 - 11).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = (0 until 3).map { c =>
      (c.toLong, Array.tabulate(4)(d => ((c * 7 + d * 5) % 9 - 4).toFloat))
    }.toDF("vec_id", "embedding")
    def run(): Seq[(Long, Long, Double)] =
      Similarity.silhouette(vecs, cents)
        .select("vec_id", "cluster_id", "silhouette")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
        .sortBy(_._1).toSeq
    val unrolled = run()
    val saved = Similarity.UnrolledAssignLimit
    val fallback = try {
      Similarity.UnrolledAssignLimit = 1L
      run()
    } finally Similarity.UnrolledAssignLimit = saved
    assert(unrolled.size === 40)
    unrolled.zip(fallback).foreach { case ((ida, ca, sa), (idb, cb, sb)) =>
      assert(ida === idb && ca === cb)
      assert(math.abs(sa - sb) < 1e-12, s"vec $ida: $sa vs $sb")
    }
  }
}
