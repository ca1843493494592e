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
