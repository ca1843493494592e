package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The pluggable commit-publish seam: every metadata commit routes through
  * `SnapshotLog.commitGuardFor`, which is where a catalog-service CAS
  * (REST/JDBC conditional update) would slot in on object stores. */
class CommitGuardSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("p", StringType), StructField("v", LongType)))

  test("a custom guard sees every commit and can reject it") {
    import spark.implicits._
    val default = SnapshotLog.commitGuardFor
    val published = new java.util.concurrent.atomic.AtomicInteger
    @volatile var rejectNext = false
    val counting: CommitGuard = new CommitGuard {
      def publish(fs: FileSystem, tmp: Path, target: Path,
          payload: Array[Byte]): Unit = {
        published.incrementAndGet()
        if (rejectNext) { rejectNext = false; fs.delete(tmp, false); lost(target) }
        HardLinkCommitGuard.publish(fs, tmp, target, payload)
      }
    }
    SnapshotLog.commitGuardFor = (_, _) => counting
    try {
      val t = GraftTable.create(spark, tmpDir("guard"), "guard", schema)
      assert(published.get === 1) // the create's initial metadata commit
      t.append(Seq(("a", 1L)).toDF("p", "v"))
      assert(published.get === 2)
      // a guard rejection surfaces as the standard concurrent-commit
      // conflict, so the append retry loop recovers on fresh metadata
      rejectNext = true
      t.append(Seq(("a", 2L)).toDF("p", "v"))
      assert(t.toDF.count() === 2)
      assert(published.get === 4) // rejected attempt + successful retry
    } finally SnapshotLog.commitGuardFor = default
  }

  test("default guard selection: hard link on local FS") {
    val p = new Path(tmpDir("guard-sel"), "x")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotLog.commitGuardFor(fs, p) === HardLinkCommitGuard)
  }
}
