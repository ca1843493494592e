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
}
