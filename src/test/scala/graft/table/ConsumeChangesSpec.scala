package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.apps.ActivityData

/** Incremental change consumption: initial full load, then per-call
  * changelog ranges, exactly-once offset advancement, crash replay. */
class ConsumeChangesSpec extends SparkTestBase {

  private def collectChanges(df: DataFrame): Seq[(String, String)] =
    df.select("txn_id", "_change_type").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq

  test("consume: initial load, incremental ranges, then caught-up None") {
    val t = GraftTable.create(spark, tmpDir("consume"), "consume",
      ActivityData.schema, ActivityData.partitionCols)
    t.append(ActivityData.day1(spark)) // txn1..txn15
    val cp = tmpDir("consume-cp")

    var seen: Seq[(String, String)] = Seq.empty
    val r1 = t.consumeChanges(cp)(df => seen = collectChanges(df))
    assert(r1.isDefined && r1.get._2 === t.meta.currentSnapshotId.get)
    assert(seen.size === 15 && seen.forall(_._2 === "INSERT"))

    // caught up: nothing to process, processor must not run
    var ran = false
    assert(t.consumeChanges(cp)(_ => ran = true) === None)
    assert(!ran)

    // new commits: an append and a MoR delete arrive as one changelog range
    t.append(ActivityData.day2(spark).filter(col("txn_id") === "txn16"))
    t.deleteWhereMoR(col("txn_id") === "txn3", Seq("txn_id"))
    val r2 = t.consumeChanges(cp)(df => seen = collectChanges(df))
    assert(r2.isDefined)
    assert(seen === Seq(("txn16", "INSERT"), ("txn3", "DELETE")).sorted)
    assert(t.consumeChanges(cp)(_ => fail("no new commits")) === None)
  }

  test("a crash between offset delete and rename loses nothing") {
    import org.apache.hadoop.fs.Path
    val t = GraftTable.create(spark, tmpDir("consume3"), "consume3",
      ActivityData.schema, ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val cp = tmpDir("consume3-cp")
    t.consumeChanges(cp)(_ => ()) // establish the offset
    val head1 = t.meta.currentSnapshotId.get
    t.append(ActivityData.day2(spark).filter(col("txn_id") === "txn16"))
    val head2 = t.meta.currentSnapshotId.get
    // simulate the advance-window crash: the new head was processed and
    // written to a tmp, the old offset already deleted, rename never ran
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(cp).getFileSystem(conf)
    val out = fs.create(new Path(cp, ".offset-crashed"), false)
    try out.write(head2.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(new Path(cp, "offset"), false)
    // recovery resumes from the tmp's processed head: nothing to consume
    // (NOT a full-state replay of all 16 rows)
    assert(t.consumeChanges(cp)(df =>
      fail(s"replayed ${df.count()} rows after crash")) === None)
    // a later commit consumes exactly the new range, and the recovered
    // offset is re-committed durably (tmp swept)
    t.deleteWhereMoR(col("txn_id") === "txn3", Seq("txn_id"))
    var seen: Seq[(String, String)] = Seq.empty
    val r = t.consumeChanges(cp)(df => seen = collectChanges(df))
    assert(r.isDefined && r.get._1 === head2)
    assert(seen === Seq(("txn3", "DELETE")))
    assert(fs.exists(new Path(cp, "offset")))
    assert(!fs.exists(new Path(cp, ".offset-crashed")))
    assert(head1 < head2)
  }

  test("initial load is pinned to the captured head snapshot") {
    // a WAP session redirect (or a commit racing the initial load) must
    // not leak rows beyond the checkpointed snapshot into the first batch
    val loc = tmpDir("consume4")
    val t = GraftTable.create(spark, loc, "consume4",
      ActivityData.schema, ActivityData.partitionCols,
      props = Map("write.wap.enabled" -> "true"))
    t.append(ActivityData.day1(spark)) // 15 rows on main
    val mainHead = t.meta.currentSnapshotId.get
    // stage extra rows on a WAP branch and leave the session redirected:
    // an unpinned toDF would resolve the staged branch and deliver 16 rows
    spark.conf.set("spark.graft.wap.branch", "audit")
    t.createOrReplaceBranch("audit")
    try {
      t.append(ActivityData.day2(spark).filter(col("txn_id") === "txn16"))
      val cp = tmpDir("consume4-cp")
      var n = -1L
      var ids: Set[Long] = Set.empty
      val r = t.consumeChanges(cp) { df =>
        n = df.count()
        ids = df.select("_commit_snapshot_id").distinct()
          .collect().map(_.getLong(0)).toSet
      }
      // the batch is exactly the checkpointed main head: 15 rows, one id
      assert(r.isDefined && r.get._2 === mainHead)
      assert(n === 15)
      assert(ids === Set(mainHead))
    } finally spark.conf.unset("spark.graft.wap.branch")
  }

  test("a crashed processor leaves the checkpoint untouched and replays") {
    val t = GraftTable.create(spark, tmpDir("consume2"), "consume2",
      ActivityData.schema, ActivityData.partitionCols)
    t.append(ActivityData.day1(spark))
    val cp = tmpDir("consume2-cp")
    t.consumeChanges(cp)(_ => ()) // establish the offset
    t.append(ActivityData.day2(spark).filter(col("txn_id") === "txn17"))
    intercept[RuntimeException] {
      t.consumeChanges(cp)(_ => throw new RuntimeException("consumer died"))
    }
    // offset did not advance: the same range replays on retry
    var seen: Seq[(String, String)] = Seq.empty
    val r = t.consumeChanges(cp)(df => seen = collectChanges(df))
    assert(r.isDefined)
    assert(seen === Seq(("txn17", "INSERT")))
  }
}
