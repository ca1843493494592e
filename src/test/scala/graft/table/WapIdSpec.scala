package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * WAP by id (round 15 — Iceberg's `spark.wap.id` staging mode, the
 * second WAP route next to `spark.wap.branch`): a data commit under a
 * session wap id lands in the snapshot log stamped `wap.id` with NO ref
 * moving; audits address the staged snapshot explicitly; cherry-pick
 * publishes it once, stamping `published-wap-id`.
 */
class WapIdSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def withWapId[T](id: String)(body: => T): T = {
    spark.conf.set("spark.graft.wap.id", id)
    try body finally spark.conf.unset("spark.graft.wap.id")
  }

  private def mk(name: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(name), name, schema,
      props = Map("write.wap.enabled" -> "true"))
    t.append(Seq((1L, "base")).toDF("id", "v"))
    t
  }

  test("staging: the commit is logged and stamped, main does not move") {
    import spark.implicits._
    val t = mk("wapid-stage")
    val mainBefore = t.meta.currentSnapshotId.get
    withWapId("w1") { t.append(Seq((2L, "staged")).toDF("id", "v")) }
    val m = t.meta
    assert(m.currentSnapshotId.get === mainBefore, "main must not advance")
    val staged = t.snapshotForWapId("w1").get
    assert(staged.summary("wap.id") === "w1")
    assert(staged.parentId === Some(mainBefore))
    // plain reads see main only; the audit addresses the staged snapshot
    assert(t.toDF.count() === 1L)
    assert(t.asOfSnapshot(staged.id).count() === 2L)
  }

  test("publish via cherry-pick: lands on main once, double-publish refused") {
    import spark.implicits._
    val t = mk("wapid-pub")
    withWapId("w2") { t.append(Seq((2L, "staged")).toDF("id", "v")) }
    val staged = t.snapshotForWapId("w2").get
    t.cherryPick(staged.id)
    assert(t.toDF.count() === 2L)
    assert(t.meta.currentSnapshot.get.summary("published-wap-id") === "w2")
    val e = intercept[IllegalArgumentException] { t.cherryPick(staged.id) }
    assert(e.getMessage.contains("already"))
  }

  test("a wap id without write.wap.enabled stages nothing") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("wapid-off"), "wo", schema)
    t.append(Seq((1L, "base")).toDF("id", "v"))
    withWapId("w3") { t.append(Seq((2L, "plain")).toDF("id", "v")) }
    assert(t.toDF.count() === 2L, "without the property, writes are plain")
    assert(t.snapshotForWapId("w3").isEmpty)
  }

  test("duplicate staged wap id and dual staging modes are refused") {
    import spark.implicits._
    val t = mk("wapid-dup")
    withWapId("w4") { t.append(Seq((2L, "a")).toDF("id", "v")) }
    val dup = intercept[IllegalArgumentException] {
      withWapId("w4") { t.append(Seq((3L, "b")).toDF("id", "v")) }
    }
    assert(dup.getMessage.contains("already has a staged snapshot"))
    t.createOrReplaceBranch("audit_branch")
    spark.conf.set("spark.graft.wap.branch", "audit_branch")
    try {
      val both = intercept[IllegalArgumentException] {
        withWapId("w5") { t.append(Seq((4L, "c")).toDF("id", "v")) }
      }
      assert(both.getMessage.contains("pick one staging mode"))
    } finally spark.conf.unset("spark.graft.wap.branch")
  }

  test("non-append staged commits publish by fast-forward while main is unmoved") {
    import spark.implicits._
    val t = mk("wapid-rowlevel")
    t.append(Seq((2L, "x"), (3L, "y")).toDF("id", "v"))
    val mainBefore = t.meta.currentSnapshotId.get
    // a row-level write under a wap id stages without moving main
    val staged = withWapId("wd1") {
      t.deleteWhere(col("id") === 2L)
    }
    assert(t.meta.currentSnapshotId.get === mainBefore)
    assert(staged.operation === "delete")
    assert(t.toDF.count() === 3L, "main still sees the deleted row")
    // publish: main has not advanced past the staged parent, so the
    // cherry-pick fast-forwards the ref onto the staged snapshot
    t.cherryPick(staged.id)
    assert(t.meta.currentSnapshotId.get === staged.id)
    assert(t.toDF.count() === 2L)
    assert(t.toDF.filter(col("id") === 2L).count() === 0L)
    // publishing the same snapshot again is refused
    val again = intercept[IllegalArgumentException] { t.cherryPick(staged.id) }
    assert(again.getMessage.contains("already published"))
    // the fast-forward publish stamps the wap bookkeeping the audits and
    // the append path's double-publish guard read
    assert(t.meta.snapshot(staged.id).get
      .summary.get("published-wap-id").contains("wd1"))
  }

  test("fast-forward publish onto a branch that does not exist yet creates it") {
    import spark.implicits._
    val t = mk("wapid-newbranch")
    val staged = withWapId("wd3") { t.deleteWhere(col("id") === 1L) }
    t.cherryPick(staged.id, branch = Some("audit"))
    assert(t.meta.refs("audit") === staged.id)
    assert(t.asOf("audit").count() === 0L)
    assert(t.toDF.count() === 1L, "main is untouched by a branch publish")
  }

  test("non-append staged commit is refused once main advances past its parent") {
    import spark.implicits._
    val t = mk("wapid-rowlevel-conflict")
    val staged = withWapId("wd2") { t.deleteWhere(col("id") === 1L) }
    t.append(Seq((7L, "later")).toDF("id", "v")) // main moves on
    val err = intercept[IllegalArgumentException] { t.cherryPick(staged.id) }
    assert(err.getMessage.contains("re-stage"),
      s"must direct the user to re-stage, got: ${err.getMessage}")
    assert(t.toDF.count() === 2L, "failed publish must not change main")
  }

  test("explicit-branch writes bypass id staging; iceberg alias spark.wap.id works") {
    import spark.implicits._
    val t = mk("wapid-branch")
    t.createOrReplaceBranch("side")
    withWapId("w6") {
      // an explicit branch target is not a main-staging write
      t.append(Seq((9L, "side")).toDF("id", "v"), branch = Some("side"))
    }
    assert(t.snapshotForWapId("w6").isEmpty)
    assert(t.asOf("side").count() === 2L)
    spark.conf.set("spark.wap.id", "w7") // Iceberg's conf name
    try t.append(Seq((5L, "i")).toDF("id", "v"))
    finally spark.conf.unset("spark.wap.id")
    assert(t.snapshotForWapId("w7").isDefined)
    assert(t.toDF.filter(col("id") === 5L).count() === 0L)
  }
}
