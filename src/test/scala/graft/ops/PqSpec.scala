package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** True product quantization (round 14): sub-space codebooks, 1-byte
  * codes, ADC lookup-table search, IVF+PQ composition — the public FAISS
  * IVFPQ shape, with the quantized-trajectory determinism the oracles
  * replay and the compression factor the design exists for. */
class PqSpec extends SparkTestBase {

  // 3 loose clusters in 16 dims, deterministic jitter
  private lazy val corpus = {
    import spark.implicits._
    (0 until 240).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(16) { d =>
        (if (d % 3 == c) 1.0f else 0.05f) + ((i * 37 + d * 11) % 17) / 170.0f
      }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val cb = Similarity.pqTrain(corpus, m = 4, ksub = 8, iters = 2)

  test("pqTrain: dense codebooks, quantized codewords, stable code ids") {
    val rows = cb.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assert(rows.length === 4 * 8, "m*ksub codebook rows")
    assert(rows.forall(_._3.size === 4), "dsub-length codewords")
    // every codeword value is on the 4dp quantization grid
    assert(rows.forall(_._3.forall(v => (v * 10000).round / 10000.0 == v)),
      "codewords must be 4dp-quantized (the replayable-trajectory contract)")
    // deterministic: retraining lands on identical codebooks
    val again = Similarity.pqTrain(corpus, m = 4, ksub = 8, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assert(again.sortBy(t => (t._1, t._2)).toSeq ===
      rows.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("pqEncode: one tinyint per sub-space, valid range, exact recon norm") {
    val enc = Similarity.pqEncode(corpus, cb)
    import org.apache.spark.sql.types._
    val codesField = enc.schema("__codes").dataType
    assert(codesField === ArrayType(ByteType, containsNull = false),
      s"codes must be 1-byte storage, got $codesField")
    val rows = enc.select(col("neighbor_id"), col("__codes"), col("__rnorm"))
      .collect()
    assert(rows.length === 240)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1).map(_.toInt + 128)
      assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 8),
        s"codes out of range: $codes")
      // recon norm equals sqrt of the summed chosen-codeword norms
      val want = math.sqrt(codes.zipWithIndex.map { case (c, s) =>
        cbMap((s, c)).map(x => x * x).sum }.sum)
      assert(math.abs(r.getDouble(2) - want) < 1e-9)
    }
    // compression: dim*4 float bytes -> m code bytes
    val dim = 16; val m = 4
    val factor = dim * 4.0 / m
    assert(factor >= 16.0, s"code-payload compression $factor must be >= 16x")
  }

  test("pqEncode: null and wrong-dim vectors encode to null codes") {
    import spark.implicits._
    val bad = Seq(
      (900L, Option.empty[Seq[Float]]),
      (901L, Some(Seq(1.0f, 2.0f)))).toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(bad, cb).collect()
    assert(enc.forall(r => r.isNullAt(r.fieldIndex("__codes"))))
  }

  test("pqSearch: recall >= 0.6 vs brute force; exact rescore exactness") {
    val queries = corpus.filter(col("vec_id") < 8)
    val enc = Similarity.pqEncode(corpus, cb)
    val pq = Similarity.pqSearch(queries, enc, cb, corpus, k = 5, rescore = 20)
      .collect()
    assert(pq.length === 8 * 5)
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = pq.count(r => exact.contains(
      (r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall $recall below bound")
    // the cosine_sim column is EXACT full-precision cosine (rescore stage)
    val exactSims = Similarity.bruteForceTopK(queries, corpus, k = 240)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { r =>
      val want = exactSims((r.getLong(0), r.getLong(2)))
      assert(math.abs(r.getDouble(4) - want) < 1e-9,
        "rescored cosine must be the exact full-precision value")
    }
  }

  test("pqSearch with unbounded rescore is provably exhaustive-exact") {
    val queries = corpus.filter(col("vec_id") < 5)
    val enc = Similarity.pqEncode(corpus, cb)
    val pq = Similarity.pqSearch(queries, enc, cb, corpus, k = 5,
        rescore = Int.MaxValue)
      .select("query_id", "rank", "neighbor_id", "cosine_sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(pq === exact)
  }

  test("ivfSearchPq: exhaustive config equals brute force; tuned config recalls") {
    val queries = corpus.filter(col("vec_id") < 5)
    val index = Similarity.buildIvfIndex(corpus, nCells = 6)
    val all = Similarity.ivfSearchPq(queries, index, cb, k = 5,
        nProbe = 6, rescore = Int.MaxValue)
      .select("query_id", "rank", "neighbor_id", "cosine_sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(all === exact, "nProbe=nCells + unbounded rescore must be exact")
    val tuned = Similarity.ivfSearchPq(queries, index, cb, k = 5,
      nProbe = 3, rescore = 20).collect()
    val hits = tuned.count(r => exact.exists(e =>
      e._1 == r.getLong(0) && e._3 == r.getLong(2)))
    assert(hits.toDouble / exact.size >= 0.5,
      s"tuned IVFPQ recall ${hits.toDouble / exact.size} below bound")
  }

  test("persisted PQ index: save/load round-trips; pruned serving equals inline") {
    val queries = corpus.filter(col("vec_id") < 4)
    val index = Similarity.buildIvfIndex(corpus, nCells = 6)
    val encoded = Similarity.pqEncode(
      index.assigned.select(col("neighbor_id").as("vec_id"), col("__cell"),
        col("__cv").as("embedding")),
      cb, passthrough = Seq("__cell"))
    val dir = tmpDir("pqidx")
    Similarity.savePqIndex(cb, encoded, dir)
    val (cbL, encL) = Similarity.loadPqIndex(spark, dir)
    assert(cbL.count() === cb.count())
    assert(encL.count() === corpus.count())
    def res(enc: Option[org.apache.spark.sql.DataFrame], prune: Boolean) =
      Similarity.ivfSearchPq(queries, index, cbL, k = 3, nProbe = 3,
          rescore = 12, encoded = enc, pruneScan = prune)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
        .toSet
    val inline = res(None, prune = false)
    assert(inline.nonEmpty)
    assert(res(Some(encL), prune = false) === inline,
      "the persisted encode must serve identical results")
    assert(res(Some(encL), prune = true) === inline,
      "partition-pruned serving must not change results")
    // the encoded table is CELL-partitioned: the pruned search's scan
    // carries a static __cell IN partition filter (the saveIvfIndex
    // pruning idiom — unprobed code files are never opened)
    val prunedPlan = Similarity.ivfSearchPq(queries, index, cbL, k = 3,
        nProbe = 2, rescore = 12, encoded = Some(encL), pruneScan = true)
      .queryExecution.executedPlan.toString
    val filterLine = prunedPlan.linesIterator.find(l =>
      l.contains("PartitionFilters: [__cell#") && l.contains(" IN ("))
    assert(filterLine.isDefined,
      s"expected a static __cell IN partition filter:\n$prunedPlan")
  }

  test("plan shape: ADC scoring broadcasts queries; corpus never shuffles pre-topk") {
    val queries = corpus.filter(col("vec_id") < 3)
    val enc = Similarity.pqEncode(corpus, cb)
    val plan = Similarity.pqSearch(queries, enc, cb, corpus, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
    // the encoded candidate side must reach its first exchange only at the
    // salted top-k (scored rows: id + 9dp sim), never carrying vectors
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join of the corpus against queries:\n$plan")
  }

  test("parquet storage: encoded corpus is an order of magnitude smaller") {
    import spark.implicits._
    // big enough that data dwarfs the parquet footer, with high-entropy
    // floats so the raw side cannot dictionary-encode away
    val big = (0 until 4000).map { i =>
      (i.toLong, Array.tabulate(64) { d =>
        (((i * 1103515245L + d * 12345L) % 1000003L).toFloat / 1000003f)
      }.toSeq)
    }.toDF("vec_id", "embedding")
    val bigCb = Similarity.pqTrain(big, m = 8, ksub = 16, iters = 1)
    val dir = tmpDir("pqsize")
    big.select("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/raw")
    Similarity.pqEncode(big, bigCb)
      .select(col("neighbor_id"), col("__codes"), col("__rnorm"))
      .coalesce(1).write.parquet(s"$dir/enc")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val raw = bytes(s"$dir/raw"); val encB = bytes(s"$dir/enc")
    assert(raw > 0 && encB > 0)
    assert(raw.toDouble / encB >= 4.0,
      s"expected >=4x smaller files, raw=$raw enc=$encB")
  }
}
