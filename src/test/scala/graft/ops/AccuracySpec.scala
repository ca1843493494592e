package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Measured-accuracy guards for the two approximate scale paths that are
 * rows-only / exhaustively-configured at the correctness gate:
 *  - q12's HLL sketch (approx_count_distinct) vs the exact q11 counts;
 *  - IVF ANN with a PRODUCTION probe budget (nProbe < nCells) vs the exact
 *    brute-force top-k (the declared s_ann_ivf query keeps nProbe = nCells,
 *    where the DuckDB oracle proves exact equality — this test is what
 *    licenses shrinking nProbe at scale).
 */
class AccuracySpec extends SparkTestBase {

  test("approx_count_distinct stays within relative error of exact counts") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_n"))
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_n"))
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(a - e) / e
      // rsd 0.02 declared; 3 sigma + slack — a real sketch bug is orders off
      assert(rel <= 0.08, s"${r.getString(0)}: exact=$e approx=$a rel=$rel")
    }
  }

  test("IVF ANN at production nProbe < nCells keeps high recall vs brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, e, k = 5))
    val ivf = pairs(Similarity.ivfTopK(queries, e, k = 5, nCells = 16, nProbe = 4))
    val recall = (ivf intersect exact).size.toDouble / exact.size
    info(f"IVF nProbe=4/16 recall@5 = $recall%.3f (${exact.size} truth pairs)")
    assert(recall >= 0.55,
      f"recall@5 $recall%.3f collapsed — cell assignment or probe ranking broke")
    // probing more cells must not reduce recall (monotone in nProbe)
    val ivf8 = pairs(Similarity.ivfTopK(queries, e, k = 5, nCells = 16, nProbe = 8))
    val recall8 = (ivf8 intersect exact).size.toDouble / exact.size
    info(f"IVF nProbe=8/16 recall@5 = $recall8%.3f")
    assert(recall8 >= recall - 1e-9)
  }

  test("quantized IVF at production shortlist keeps high recall vs brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, e, k = 5))
    val index = Similarity.buildIvfIndex(e, nCells = 16)
    // production config: 4/16 cells probed AND only a 32-candidate int8
    // shortlist exactly rescored — both approximations active
    val pq = pairs(Similarity.ivfSearchQuantized(queries, index, k = 5,
      nProbe = 4, rescore = 32))
    val recall = (pq intersect exact).size.toDouble / exact.size
    info(f"IVF-PQ nProbe=4/16 rescore=32 recall@5 = $recall%.3f")
    assert(recall >= 0.5,
      f"recall@5 $recall%.3f collapsed — quantized shortlist or rescore broke")
    // a larger shortlist must not reduce recall (monotone in rescore)
    val pq128 = pairs(Similarity.ivfSearchQuantized(queries, index, k = 5,
      nProbe = 4, rescore = 128))
    val recall128 = (pq128 intersect exact).size.toDouble / exact.size
    info(f"IVF-PQ rescore=128 recall@5 = $recall128%.3f")
    assert(recall128 >= recall - 1e-9)
    // int8 shortlist ranking is a genuine approximation of the exact
    // ordering: the same probe budget with unbounded rescore equals the
    // plain (unquantized) ivfSearch output
    val unq = pairs(Similarity.ivfSearch(queries, index, k = 5, nProbe = 4))
    val pqAll = pairs(Similarity.ivfSearchQuantized(queries, index, k = 5,
      nProbe = 4, rescore = Int.MaxValue))
    assert(pqAll === unq, "unbounded rescore must equal unquantized search")
  }
}
