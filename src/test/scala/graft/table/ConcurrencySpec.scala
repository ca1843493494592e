package graft.table

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Same-JVM concurrent writers serialize through the per-table commit lock;
  * every commit must survive and the final state must contain all rows. */
class ConcurrencySpec extends SparkTestBase {

  test("8 concurrent appends all commit; snapshot lineage is linear") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("conc"), "c", StructType(Seq(
      StructField("writer", IntegerType), StructField("v", LongType))))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 8).map { w =>
      Future {
        t.append((0 until 50).map(i => (w, i.toLong)).toDF("writer", "v"))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    pool.shutdown()
    assert(t.toDF.count() === 400)
    assert(t.toDF.groupBy("writer").count().collect()
      .forall(_.getLong(1) === 50))
    val m = t.meta
    assert(m.snapshots.size === 8)
    // linear history: every snapshot's parent is the previous one
    val ordered = m.snapshots.sortBy(_.id)
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(b.parentId.contains(a.id))
      case _ =>
    }
  }

  test("concurrent merge + append interleave without losing rows") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("conc2"), "c2", StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    t.append((0 until 100).map(i => (s"k$i", i.toLong)).toDF("k", "v"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = Seq(
      Future(t.merge((0 until 50).map(i => (s"k$i", i + 1000L)).toDF("k", "v"), Seq("k"))),
      Future(t.append((100 until 150).map(i => (s"k$i", i.toLong)).toDF("k", "v"))),
      Future(t.merge((200 until 220).map(i => (s"k$i", i.toLong)).toDF("k", "v"), Seq("k"))))
    Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    assert(t.toDF.count() === 170) // 100 base + 50 appended + 20 inserted
    assert(t.toDF.filter($"k" === "k10").collect().head.getLong(1) === 1010L)
  }

  test("append retries through a conflicting foreign-process commit") {
    import graft.apps.ActivityData
    val loc = tmpDir("conc-retry")
    val t = GraftTable.create(spark, loc, "retry", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val conf = spark.sparkContext.hadoopConfiguration
    // inject a foreign commit (simulating another JVM, which the per-table
    // lock cannot see) into the window between our append's metadata read
    // and its CAS — exactly once
    var injected = false
    GraftTable.onBeforeCommit = () => if (!injected) {
      injected = true
      val m = SnapshotLog.read(loc, conf)
      SnapshotLog.commit(loc, m.copy(props = m.props + ("foreign" -> "1")), conf)
    }
    try t.append(ActivityData.day2(spark))
    finally GraftTable.onBeforeCommit = () => ()
    assert(injected)
    // both the foreign commit and the retried append survived
    assert(t.toDF.count() === 30)
    assert(t.properties("foreign") === "1")
    // lineage stayed linear: append snapshot's parent is day1's snapshot
    val snaps = t.meta.snapshots.sortBy(_.id)
    assert(snaps.map(_.id) === Seq(1L, 2L))
    assert(snaps.last.parentId === Some(1L))
  }

  test("metadata-only ops retry through a conflicting foreign-process commit") {
    import graft.apps.ActivityData
    val loc = tmpDir("conc-meta")
    val t = GraftTable.create(spark, loc, "metaretry", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val conf = spark.sparkContext.hadoopConfiguration
    var injected = false
    GraftTable.onBeforeCommit = () => if (!injected) {
      injected = true
      val m = SnapshotLog.read(loc, conf)
      SnapshotLog.commit(loc, m.copy(props = m.props + ("foreign" -> "1")), conf)
    }
    // branch creation re-reads fresh metadata and re-applies — both the
    // foreign property AND the branch must land
    try t.createOrReplaceBranch("b1")
    finally GraftTable.onBeforeCommit = () => ()
    assert(injected)
    assert(t.properties("foreign") === "1")
    assert(t.meta.refs.get("b1") === t.meta.currentSnapshotId)
  }

  test("a conflicted CoW operation propagates instead of committing stale state") {
    import graft.apps.ActivityData
    import org.apache.spark.sql.functions.col
    val loc = tmpDir("conc-cow")
    val t = GraftTable.create(spark, loc, "cowretry", ActivityData.schema,
      ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val conf = spark.sparkContext.hadoopConfiguration
    var injected = false
    GraftTable.onBeforeCommit = () => if (!injected) {
      injected = true
      val m = SnapshotLog.read(loc, conf)
      SnapshotLog.commit(loc, m.copy(props = m.props + ("foreign" -> "1")), conf)
    }
    // the delete's file probe ran against pre-conflict metadata: committing
    // anyway could drop rows a foreign writer just changed — must fail
    val e = intercept[IllegalStateException] {
      try t.deleteWhere(col("txn_id") === "txn1")
      finally GraftTable.onBeforeCommit = () => ()
    }
    assert(e.getMessage.contains("Concurrent commit"))
    assert(t.toDF.count() === 15) // nothing was lost or half-committed
  }
}
