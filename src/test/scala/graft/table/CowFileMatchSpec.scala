package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * CoW affected-file matching must be O(|files| + |matches|), not the
 * O(|files| × |matches|) suffix scan it once was: on a 10⁶-file table
 * where a merge matches rows in most files the quadratic form runs
 * ~10¹¹ driver-side string comparisons before any task launches.
 * Pins (a) exact-file selectivity end-to-end (a merge touching one
 * file's keys rewrites exactly that file) and (b) the scale shape
 * directly on partitionAffected with 3×10⁴ files × 3×10⁴ matched URIs —
 * ~9×10⁸ endsWith probes for the quadratic form (minutes), a hash-set
 * pass for the linear one (bounded generously at 20 s).
 */
class CowFileMatchSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("merge rewrites exactly the files containing matched keys") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("cow-match"), "cm", schema, Seq.empty)
    // three single-task appends -> three data files with disjoint key ranges
    t.append(Seq((1L, "a"), (2L, "a")).toDF("id", "v").coalesce(1))
    t.append(Seq((10L, "a"), (11L, "a")).toDF("id", "v").coalesce(1))
    t.append(Seq((20L, "a"), (21L, "a")).toDF("id", "v").coalesce(1))
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert(before.size === 3)

    t.merge(Seq((10L, "UPD"), (99L, "NEW")).toDF("id", "v"), Seq("id"))

    val snap = t.meta.currentSnapshot.get
    val after = snap.files.map(_.path).toSet
    // exactly one pre-existing file (the one holding id=10) was removed
    val survivors = before.intersect(after)
    assert(survivors.size === 2,
      s"expected 2 untouched files to survive, got ${survivors.size}")
    val rows = t.toDF.orderBy("id").as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "a"), (2L, "a"), (10L, "UPD"), (11L, "a"),
      (20L, "a"), (21L, "a"), (99L, "NEW")))
  }

  test("partitionAffected is linear: 3e4 files x 3e4 matches in seconds") {
    val t = GraftTable.create(spark, tmpDir("cow-scale"), "cs", schema, Seq.empty)
    val n = 30000
    val files = (0 until n).map(i =>
      DataFile(f"dt=2024-01-01/part-$i%05d.parquet", Map.empty, 1L, 1L))
    // input_file_name()-style fully-qualified URIs for every even file
    val matched = (0 until n by 2).map(i =>
      f"file:${t.dataDir}%s/dt=2024-01-01/part-$i%05d.parquet").toSet
    val start = System.nanoTime()
    val (affected, untouched) = t.partitionAffected(files, matched)
    val elapsedSec = (System.nanoTime() - start) / 1e9
    assert(affected.size === n / 2)
    assert(untouched.size === n / 2)
    assert(affected.forall(f => f.path.stripSuffix(".parquet").takeRight(5).toInt % 2 == 0))
    assert(elapsedSec < 20.0,
      f"affected-file matching took $elapsedSec%.1f s for $n files — quadratic?")
  }

  test("partitionAffected matches URL-encoded input_file_name URIs") {
    val loc = tmpDir("cow enc") // space in the table path -> %20 in the URI
    val t = GraftTable.create(spark, loc, "ce", schema, Seq.empty)
    val f = DataFile("part-0.parquet", Map.empty, 1L, 1L)
    val qualified = new org.apache.hadoop.fs.Path(s"${t.dataDir}/part-0.parquet")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(s"${t.dataDir}/part-0.parquet"))
    val encoded = qualified.toUri.toASCIIString // what input_file_name emits
    assert(encoded.contains("%20"), s"fixture lost its space: $encoded")
    val (affected, _) = t.partitionAffected(Seq(f), Set(encoded))
    assert(affected === Seq(f))
  }
}
