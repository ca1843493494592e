package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Pins the snapshot-log read caches added in round 10.
  *
  * Contract under test:
  *  - committed root-metadata versions are immutable, so a re-read of the
  *    same (tableDir, version) returns the MEMOIZED parse (same instance —
  *    no re-read, no re-JSON-parse, and each snapshot's lazily-resolved
  *    manifest contents are shared);
  *  - a new commit is picked up immediately (new version ⇒ new cache key);
  *  - DROP + recreate in the same directory can never serve the old
  *    table's metadata (explicit invalidation on drop, plus (modTime, len)
  *    stat-validation on every hit);
  *  - manifest memoization survives interleaved reads of other tables
  *    (access-order LRU — the pre-r10 cache cleared WHOLESALE at capacity,
  *    which thrashed every table's manifests once the fixture population
  *    outgrew the cap). */
class MetaCacheSpec extends SparkTestBase {
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def conf = spark.sparkContext.hadoopConfiguration

  test("re-reading an unchanged version returns the memoized parse") {
    val dir = tmpDir("metacache")
    val t = GraftTable.create(spark, dir, "mc", schema)
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val m1 = SnapshotLog.read(dir, conf)
    val m2 = SnapshotLog.read(dir, conf)
    assert(m1 eq m2, "second read of an unchanged version must hit the cache")
    // shared instance ⇒ shared lazy manifest resolution
    assert(m1.currentSnapshot.get.files.nonEmpty)
    assert(m2.currentSnapshot.get.files eq m1.currentSnapshot.get.files)
  }

  test("a new commit is visible immediately (no stale head)") {
    val dir = tmpDir("metacache")
    val t = GraftTable.create(spark, dir, "mc", schema)
    import spark.implicits._
    t.append(Seq((1L, "a")).toDF("id", "v"))
    val before = SnapshotLog.read(dir, conf)
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val after = SnapshotLog.read(dir, conf)
    assert(after.version > before.version)
    assert(after.currentSnapshot.get.totalRecords == 2L)
  }

  test("drop + recreate in the same directory never serves stale metadata") {
    val dir = tmpDir("metacache")
    val t1 = GraftTable.create(spark, dir, "old_name", schema)
    import spark.implicits._
    t1.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(SnapshotLog.read(dir, conf).name == "old_name")
    GraftTable.drop(spark, dir)
    val t2 = GraftTable.create(spark, dir, "new_name", schema)
    t2.append(Seq((9L, "z")).toDF("id", "v"))
    val m = SnapshotLog.read(dir, conf)
    assert(m.name == "new_name")
    assert(m.currentSnapshot.get.totalRecords == 1L)
    assert(t2.toDF.count() == 1L)
  }

  test("manifest memoization survives interleaved reads of other tables") {
    val dirA = tmpDir("metacacheA")
    val tA = GraftTable.create(spark, dirA, "a", schema)
    import spark.implicits._
    tA.append(Seq((1L, "a")).toDF("id", "v"))
    val firstFiles = SnapshotLog.read(dirA, conf).currentSnapshot.get.files
    // touch several other tables' metadata + manifests in between
    (1 to 4).foreach { i =>
      val d = tmpDir(s"metacacheB$i")
      val tB = GraftTable.create(spark, d, s"b$i", schema)
      tB.append(Seq((i.toLong, "x")).toDF("id", "v"))
      assert(SnapshotLog.read(d, conf).currentSnapshot.get.files.nonEmpty)
    }
    val again = SnapshotLog.read(dirA, conf).currentSnapshot.get.files
    assert(again eq firstFiles,
      "table A's resolved manifests must still be cached after other tables were read")
  }
}
