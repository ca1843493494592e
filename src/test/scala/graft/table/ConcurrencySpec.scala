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
}
