package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Per-ref retention on expire_snapshots (round 15, Iceberg's SnapshotRef
 * retention fields + `history.expire.max-ref-age-ms`): without these,
 * every branch/tag pin is immortal and metadata grows without bound on
 * long-lived WAP/tag refs.
 */
class RefRetentionSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def mk(name: String): GraftTable = {
    val t = GraftTable.create(spark, tmpDir(name), name, schema)
    t
  }

  private def app(t: GraftTable, i: Long): Unit = {
    import spark.implicits._
    t.append(Seq((i, s"v$i")).toDF("id", "v"))
  }

  test("max-ref-age-ms ages out tags and branches; main never expires") {
    val t = mk("rr-age")
    app(t, 1)
    t.createTag("old_tag")
    t.setRefRetention("old_tag", maxRefAgeMs = Some(1000L))
    t.createOrReplaceBranch("old_branch")
    t.setRefRetention("old_branch", maxRefAgeMs = Some(1000L))
    t.createOrReplaceBranch("forever") // no policy, no table default
    app(t, 2)
    val future = System.currentTimeMillis() + 3600L * 1000
    t.expireSnapshots(olderThanMs = 0L, retainLast = 1, nowMs = future)
    val m = t.meta
    assert(!m.tags.contains("old_tag"))
    assert(!m.refs.contains("old_branch"))
    assert(m.refs.contains("forever"), "a ref without a policy is immortal")
    assert(m.refs.contains(SnapshotLog.MainBranch))
    assert(m.refRetention.keySet === Set.empty,
      "policies of dropped refs are cleaned up")
  }

  test("table-wide history.expire.max-ref-age-ms is the default; per-ref overrides") {
    val t = mk("rr-default")
    t.setProperties(Map("history.expire.max-ref-age-ms" -> "1000"))
    app(t, 1)
    t.createTag("defaulted")        // inherits the 1s table default
    t.createOrReplaceBranch("kept") // overridden to a year
    t.setRefRetention("kept", maxRefAgeMs = Some(365L * 24 * 3600 * 1000))
    val future = System.currentTimeMillis() + 3600L * 1000
    t.expireSnapshots(olderThanMs = 0L, retainLast = 1, nowMs = future)
    assert(!t.meta.tags.contains("defaulted"))
    assert(t.meta.refs.contains("kept"))
    assert(t.meta.refs.contains(SnapshotLog.MainBranch),
      "main ignores the table-wide ref age")
  }

  test("min-snapshots-to-keep preserves branch ancestry beyond retain_last") {
    val t = mk("rr-min")
    app(t, 1); app(t, 2)
    t.createOrReplaceBranch("pinned")
    t.setRefRetention("pinned", minSnapshotsToKeep = Some(2))
    app(t, 3); app(t, 4)
    val pinnedHead = t.meta.refs("pinned")
    val pinnedParent = t.meta.ancestry(pinnedHead)(1)
    val midMain = t.meta.ancestry(t.meta.currentSnapshotId.get)(1)
    val future = System.currentTimeMillis() + 3600L * 1000
    val expired = t.expireSnapshots(olderThanMs = future, retainLast = 1,
      nowMs = future)
    val m = t.meta
    // pinned keeps head + parent through its policy; the unshielded
    // middle main snapshot expires
    assert(m.snapshot(pinnedHead).isDefined)
    assert(m.snapshot(pinnedParent).isDefined,
      "min-snapshots-to-keep=2 must keep the branch parent")
    assert(expired.contains(midMain))
    assert(m.snapshot(midMain).isEmpty)
    // the retained ancestry is readable (time travel to the parent)
    assert(t.asOf(pinnedParent.toString).count() === 1L)
    assert(t.asOf("pinned").count() === 2L)
  }

  test("max-snapshot-age-ms keeps young branch ancestors past the global horizon") {
    val t = mk("rr-maxage")
    app(t, 1); app(t, 2); app(t, 3)
    t.createOrReplaceBranch("window")
    // keep EVERYTHING younger than a year on this branch (all of it)
    t.setRefRetention("window", maxSnapshotAgeMs = Some(365L * 24 * 3600 * 1000))
    val ancestors = t.meta.ancestry(t.meta.refs("window"))
    val future = System.currentTimeMillis() + 3600L * 1000
    t.expireSnapshots(olderThanMs = future, retainLast = 1, nowMs = future)
    val m = t.meta
    ancestors.foreach(id => assert(m.snapshot(id).isDefined,
      s"snapshot $id inside the branch age window must survive"))
  }

  test("policy validation: tags take only max-ref-age-ms; main never ages") {
    val t = mk("rr-valid")
    app(t, 1)
    t.createTag("tg")
    intercept[IllegalArgumentException] {
      t.setRefRetention("tg", minSnapshotsToKeep = Some(2))
    }
    intercept[IllegalArgumentException] {
      t.setRefRetention(SnapshotLog.MainBranch, maxRefAgeMs = Some(1L))
    }
    intercept[IllegalArgumentException] {
      t.setRefRetention("nope", maxRefAgeMs = Some(1L))
    }
    // clearing a policy removes the entry
    t.setRefRetention("tg", maxRefAgeMs = Some(1000L))
    assert(t.meta.refRetention.contains("tg"))
    t.setRefRetention("tg")
    assert(!t.meta.refRetention.contains("tg"))
  }

  test("CALL system.set_ref_retention routes to the API") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("rr-sql-wh").toString
    spark.conf.set("spark.sql.catalog.rrcat",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.rrcat.warehouse", wh)
    val t = GraftTable.create(spark, s"$wh/ns/t", "rrcat.ns.t", schema)
    app(t, 1)
    t.createOrReplaceBranch("b")
    val row = spark.sql(
      """CALL rrcat.system.set_ref_retention('ns.t', 'b',
         min_snapshots_to_keep => 2, max_ref_age_ms => 86400000)""").head
    assert(row.getString(0) === "b")
    assert(t.meta.refRetention("b") ===
      RefRetention(Some(2), None, Some(86400000L)))
    // all-NULL knobs clear the policy
    spark.sql("CALL rrcat.system.set_ref_retention('ns.t', 'b')")
    assert(!t.meta.refRetention.contains("b"))
  }

  test("policies round-trip through metadata persistence") {
    val t = mk("rr-persist")
    app(t, 1)
    t.createOrReplaceBranch("b")
    t.setRefRetention("b", minSnapshotsToKeep = Some(3),
      maxSnapshotAgeMs = Some(123456L))
    val re = GraftTable.load(spark, t.location)
    assert(re.meta.refRetention("b") ===
      RefRetention(Some(3), Some(123456L), None))
  }
}
