package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * `write.sort-order` (round 15, Iceberg's WRITE ORDERED BY): every data
 * write clusters rows by the declared order, so files carry tight
 * min/max footer ranges on the sort columns; with
 * `write.distribution-mode=range` the commit's file key ranges are
 * additionally disjoint across tasks.
 */
class WriteOrderSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("writes cluster by the declared order; scanWhere prunes files") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def shuffled(n: Int) =
      rnd.shuffle((0 until n).toVector).map(i => (i.toLong, s"v$i"))
        .toDF("k", "v").repartition(4)

    val plain = GraftTable.create(spark, tmpDir("wo-plain"), "wop", schema)
    plain.append(shuffled(4000))
    val ordered = GraftTable.create(spark, tmpDir("wo-ord"), "woo", schema,
      props = Map("write.sort-order" -> "k ASC NULLS LAST",
        "write.distribution-mode" -> "range",
        // several files even if AQE coalesces the range shuffle: the
        // rollover splits a sorted task into consecutive-range files
        "write.target-file-size-rows" -> "1000"))
    ordered.append(shuffled(4000))

    // same state either way
    assert(ordered.toDF.as[(Long, String)].collect().sorted.toSeq ===
      plain.toDF.as[(Long, String)].collect().sorted.toSeq)

    // every ordered file is internally sorted with a TIGHT k-range;
    // ranges across the commit's files are disjoint (range distribution)
    val files = ordered.meta.currentSnapshot.get.files
    assert(files.size > 1, "fixture must produce several files")
    val ranges = files.map { f =>
      val ks = spark.read.schema(schema)
        .parquet(s"${ordered.location}/data/${f.path}")
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file ${f.path} not internally sorted")
      (ks.min, ks.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2,
        s"range-distributed ordered files must be key-disjoint: $ranges")
      case _ =>
    }

    // the point of it all: a range predicate opens FEWER files
    val prunedFiles = ordered.scanWhere(col("k") < 100).inputFiles.length
    assert(prunedFiles < files.size,
      s"expected pruning, read $prunedFiles of ${files.size}")
    assert(ordered.scanWhere(col("k") < 100).count() === 100L)
    // while the unordered twin's shuffled files all straddle the range
    val plainFiles = plain.meta.currentSnapshot.get.files.size
    val plainPruned = plain.scanWhere(col("k") < 100).inputFiles.length
    assert(plainPruned === plainFiles,
      "shuffled writes leave nothing for min/max stats to prune (control)")
  }

  test("sort order applies to merge rewrites too; clearing the property stops it") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("wo-merge"), "wom", schema,
      props = Map("write.sort-order" -> "k ASC NULLS LAST"))
    t.append((0L until 50L).map(i => (i, "a")).toDF("k", "v").repartition(3))
    t.merge(Seq((7L, "UPD"), (99L, "NEW")).toDF("k", "v"), Seq("k"))
    t.meta.currentSnapshot.get.files.foreach { f =>
      val ks = spark.read.schema(schema)
        .parquet(s"${t.location}/data/${f.path}")
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"merge-written file ${f.path} not sorted")
    }
    assert(t.toDF.filter(col("k") === 7L).head.getString(1) === "UPD")
  }
}
