package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the persisted-IVF serving path (round 10): the index saves as
  * graft tables with the inverted lists as PARTITIONS, reloads losslessly,
  * and a pruned search reads only the probed cells' files. */
class IvfPersistenceSpec extends SparkTestBase {

  private lazy val corpus = {
    import spark.implicits._
    (0 until 300).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d == c) 1.0f else 0.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + ((i * 31 + d * 7) % 13) / 130.0f }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("save/load round-trips the index and search results are identical") {
    val queries = corpus.filter(col("vec_id") < 3)
    val index = Similarity.buildIvfIndex(corpus, nCells = 6)
    val dir = tmpDir("ivfidx")
    Similarity.saveIvfIndex(index, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)

    assert(loaded.centers.count() === index.centers.count())
    assert(loaded.assigned.count() === corpus.count())

    def results(ix: Similarity.IvfIndex, prune: Boolean) =
      Similarity.ivfSearch(queries, ix, k = 3, nProbe = 3, pruneScan = prune)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine_sim")))
        .toSet
    val mem = results(index, prune = false)
    assert(mem.nonEmpty)
    assert(results(loaded, prune = false) === mem)
    assert(results(loaded, prune = true) === mem)
  }

  test("pruned search over a saved index partition-prunes the assigned scan") {
    val queries = corpus.filter(col("vec_id") === 0)
    val index = Similarity.buildIvfIndex(corpus, nCells = 6)
    val dir = tmpDir("ivfidx")
    Similarity.saveIvfIndex(index, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    val pruned = Similarity.ivfSearch(queries, loaded, k = 3, nProbe = 2,
      pruneScan = true)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    // the probed cell ids land in the scan as partition filters — the
    // unprobed inverted-list files are never opened
    assert(plan.contains("PartitionFilters") && plan.contains("__cell"),
      s"expected a __cell partition filter in the scan:\n$plan")
    val filterLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters: [__cell#") && l.contains(" IN ("))
    assert(filterLine.isDefined,
      s"expected a static __cell IN partition filter:\n$plan")
  }

  test("incremental refresh: delta assignment across 3 appends equals a full reassignment") {
    val base = corpus.filter(col("vec_id") % 4 === 0)
    val centers = Similarity.buildIvfIndex(base, nCells = 6).centers
    val dir = tmpDir("ivfrefresh")
    // persist with the refresh path's own assignment function for the base
    val baseAssigned = Similarity.assignIvfCells(base, centers)
    graft.table.GraftTable.createOrReplace(spark, s"$dir/centers",
      "ivfr_c", centers.schema).append(centers)
    graft.table.GraftTable.createOrReplace(spark, s"$dir/assigned",
      "ivfr_a", baseAssigned.schema, partitionCols = Seq("__cell"))
      .append(baseAssigned)
    (1 to 3).foreach { r =>
      Similarity.refreshIvfIndex(spark, dir, corpus.filter(col("vec_id") % 4 === r))
    }
    val loaded = Similarity.loadIvfIndex(spark, dir)
    // every corpus row present exactly once, in the cell a full
    // reassignment through the SAME centers would choose
    val stored = loaded.assigned
      .select(col("neighbor_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(stored.length === corpus.count(),
      "no row may be lost or duplicated across refreshes")
    val want = Similarity.assignIvfCells(corpus, loaded.centers)
      .select(col("neighbor_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    stored.foreach { case (id, cell) =>
      assert(want(id) === cell, s"vec $id drifted: stored $cell, want ${want(id)}")
    }
    // each refresh was ONE snapshot append on the assigned table
    assert(graft.table.GraftTable.load(spark, s"$dir/assigned")
      .meta.snapshots.size === 4)
    // the delta-assignment plan is a narrow map: no exchange, no join
    val deltaPlan = Similarity.assignIvfCells(
        corpus.filter(col("vec_id") % 4 === 1), loaded.centers)
      .queryExecution.executedPlan.toString
    assert(!deltaPlan.contains("Exchange") && !deltaPlan.contains("Join"),
      s"delta assignment must not shuffle or join:\n$deltaPlan")
  }

  test("ivfDriftStats: in-distribution batches stay healthy, a shifted batch trips refit_due") {
    import spark.implicits._
    val centers = Similarity.buildIvfIndex(corpus, nCells = 6).centers
    // batch 0 = the fit corpus (baseline), batch 1 = an i.i.d. re-draw
    // (healthy), batch 2 = the same vectors shifted far outside every
    // cell (stale centers — must fire the refit trigger)
    val b0 = corpus.withColumn("batch", lit(0))
    val b1 = corpus.withColumn("vec_id", col("vec_id") + 1000L)
      .withColumn("batch", lit(1))
    val b2 = corpus.withColumn("vec_id", col("vec_id") + 2000L)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(50.0f)))
      .withColumn("batch", lit(2))
    // batch 3 = a fully-corrupt ingest (every vector null): it must still
    // appear in the monitoring output as n_vectors=0 / null mean_d2, not
    // silently vanish from the per-batch report
    val b3 = corpus.withColumn("vec_id", col("vec_id") + 3000L)
      .withColumn("embedding", lit(null).cast("array<float>"))
      .withColumn("batch", lit(3))
    val out = Similarity.ivfDriftStats(
        b0.unionByName(b1).unionByName(b2).unionByName(b3),
        centers, "batch", baselineBatch = lit(0))
      .orderBy("batch").collect()
    assert(out.length === 4)
    val corrupt = out(3)
    assert(corrupt.getInt(0) === 3)
    assert(corrupt.getLong(1) === 0L, "all-invalid batch must report n_vectors=0")
    assert(corrupt.isNullAt(2) && corrupt.isNullAt(4) && corrupt.isNullAt(5),
      "all-invalid batch must carry null mean/ratio/refit, not fabricated numbers")
    val byBatch = out.take(3).map(r => r.getInt(0) ->
      (r.getLong(1), r.getDouble(4), r.getBoolean(5))).toMap
    assert(byBatch(0)._1 === 300L)
    assert(math.abs(byBatch(0)._2 - 1.0) < 1e-12, "baseline ratio must be exactly 1")
    assert(!byBatch(0)._3 && !byBatch(1)._3,
      "in-distribution batches must not demand a refit")
    assert(math.abs(byBatch(1)._2 - 1.0) < 1e-9, "identical re-draw drifts nowhere")
    assert(byBatch(2)._3, s"a +50-shifted batch must fire refit_due, ratio ${byBatch(2)._2}")
    assert(byBatch(2)._2 > 100.0)
  }

  test("assignIvfCells broadcast fallback matches the unrolled path (incl. null/empty vectors)") {
    import spark.implicits._
    val centers = Similarity.buildIvfIndex(corpus, nCells = 6).centers
    val withBad = corpus
      .select(col("vec_id"), col("embedding"))
      .unionByName(Seq(
        (9000L, Option.empty[Seq[Float]]),
        (9001L, Some(Seq.empty[Float])),
        // duplicated id carrying two DIFFERENT vectors: both paths must
        // keep per-row answers (an id-keyed join-back would collapse them
        // to one global minimum — the round-13 review finding)
        (9002L, Some(Seq.tabulate(8)(d => if (d == 0) 1.2f else 0.05f))),
        (9002L, Some(Seq.tabulate(8)(d => if (d == 2) 1.3f else 0.01f))))
        .toDF("vec_id", "embedding"))
      // a NULL id carrying a VALID vector must still be assigned a cell by
      // both paths (the fallback join-back must be null-safe on the id)
      .unionByName(Seq((Option.empty[Long],
        Option(Seq.tabulate(8)(d => if (d == 1) 1.1f else 0.02f))))
        .toDF("vec_id", "embedding"))
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select(col("neighbor_id"), col("__cell")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .sortBy(p => (p._1.getOrElse(Long.MinValue), p._2.getOrElse(-1))).toSeq
    val unrolled = cells(Similarity.assignIvfCells(withBad, centers))
    val saved = Similarity.UnrolledAssignLimit
    val (fallback, fallbackPlan) = try {
      Similarity.UnrolledAssignLimit = 1L // force the broadcast-join argmin
      val df = Similarity.assignIvfCells(withBad, centers)
      (cells(df), df.queryExecution.executedPlan.toString)
    } finally Similarity.UnrolledAssignLimit = saved
    assert(fallbackPlan.contains("BroadcastHashJoin") ||
      fallbackPlan.contains("BroadcastNestedLoopJoin"),
      s"fallback must broadcast the centers, not shuffle the corpus:\n$fallbackPlan")
    val byId = unrolled.toMap // (dup ids collapse here, checked separately)
    assert(byId(Some(9000L)).isEmpty && byId(Some(9001L)).isEmpty,
      "null/empty vectors must get a NULL cell")
    assert(unrolled.count(_._1.contains(9002L)) === 2,
      "duplicate-id rows must both survive")
    assert(byId(None).isDefined,
      "a NULL-id row with a valid vector must still be assigned a cell")
    // the planted duplicate must be DISCRIMINATING: if both vectors argmin
    // to one cell, an id-keyed global-min join-back (the round-13 bug)
    // would be indistinguishable from the correct per-row answer
    assert(unrolled.filter(_._1.contains(9002L)).flatMap(_._2).distinct.size === 2,
      "the two 9002 vectors must land in different cells for the test to bite")
    assert(fallback.size === unrolled.size)
    assert(fallback === unrolled)
  }
}
