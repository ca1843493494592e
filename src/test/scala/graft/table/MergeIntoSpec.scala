package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.MergeClause.src

/**
 * General MERGE clause surface ([[GraftTable.mergeInto]]): conditional
 * clauses, several clauses first-true-wins in order, and WHEN NOT MATCHED
 * BY SOURCE — semantics pinned against hand-computed expected states.
 */
class MergeIntoSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("n", LongType)))

  private def fixture(name: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(name), name, schema, Seq.empty)
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "v", "n"))
    t
  }

  private def state(t: GraftTable): Seq[(Long, String, Long)] = {
    import spark.implicits._
    t.toDF.orderBy("id").as[(Long, String, Long)].collect().toSeq
  }

  test("conditional WHEN MATCHED AND: only qualifying matches update") {
    import spark.implicits._
    val t = fixture("mi-cond")
    val source = Seq((1L, 100L), (2L, 5L)).toDF("sid", "sn")
    t.mergeInto(source, keys = Seq("id" -> col("sid")),
      matched = Seq(MergeClause.Update(
        condition = Some(src("sn") > col("n")),
        set = Seq("n" -> src("sn")))))
    // id=1 updates (100 > 10); id=2's condition is false (5 > 20), kept
    assert(state(t) === Seq((1L, "a", 100L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("multiple MATCHED clauses: first-true-wins, delete then update") {
    import spark.implicits._
    val t = fixture("mi-multi")
    val source = Seq((1L, 0L), (2L, 99L), (3L, 1L)).toDF("sid", "sn")
    t.mergeInto(source, keys = Seq("id" -> col("sid")),
      matched = Seq(
        MergeClause.Delete(Some(src("sn") === 0L)),
        MergeClause.Update(Some(src("sn") > 10L), Seq("n" -> src("sn"))),
        MergeClause.Update(None, Seq("v" -> lit("low")))))
    // id=1: sn=0 -> deleted; id=2: sn=99 -> n=99 (second clause);
    // id=3: sn=1 -> falls through to unconditional v='low'
    assert(state(t) === Seq((2L, "b", 99L), (3L, "low", 30L), (4L, "d", 40L)))
  }

  test("WHEN NOT MATCHED BY SOURCE: update and delete unreferenced rows") {
    import spark.implicits._
    val t = fixture("mi-nmbs")
    val source = Seq((1L, 11L)).toDF("sid", "sn")
    t.mergeInto(source, keys = Seq("id" -> col("sid")),
      matched = Seq(MergeClause.Update(None, Seq("n" -> src("sn")))),
      notMatchedBySource = Seq(
        MergeClause.Delete(Some(col("n") >= 40L)),
        MergeClause.Update(None, Seq("v" -> lit("stale")))))
    // id=1 matched -> n=11; id=4 (n=40) deleted; id=2,3 marked stale
    assert(state(t) === Seq((1L, "a", 11L), (2L, "stale", 20L),
      (3L, "stale", 30L)))
  }

  test("conditional INSERT + update/insert expressions may differ") {
    import spark.implicits._
    val t = fixture("mi-ins")
    val source = Seq((2L, 200L), (8L, 80L), (9L, 3L)).toDF("sid", "sn")
    t.mergeInto(source, keys = Seq("id" -> col("sid")),
      matched = Seq(MergeClause.Update(None,
        Seq("n" -> (col("n") + src("sn"))))), // references BOTH sides
      notMatched = Seq(MergeClause.Insert(
        condition = Some(src("sn") > 10L),
        values = Seq("id" -> src("sid"), "v" -> lit("new"), "n" -> src("sn")))))
    // id=2: n=20+200; id=8 inserted (80>10); id=9 NOT inserted (3<=10)
    assert(state(t) === Seq((1L, "a", 10L), (2L, "b", 220L),
      (3L, "c", 30L), (4L, "d", 40L), (8L, "new", 80L)))
  }

  test("unassigned insert columns are NULL; NULL conditions do not fire") {
    import spark.implicits._
    val t = fixture("mi-null")
    val source = Seq((5L, Option.empty[Long]), (1L, Option.empty[Long]))
      .toDF("sid", "sn")
    t.mergeInto(source, keys = Seq("id" -> col("sid")),
      matched = Seq(MergeClause.Delete(Some(src("sn") > 0L))), // NULL -> no fire
      notMatched = Seq(MergeClause.Insert(None, Seq("id" -> src("sid")))))
    val rows = t.toDF.orderBy("id").collect()
    assert(rows.length === 5) // id=1 survived the null-condition delete
    val r5 = rows.find(_.getLong(0) == 5L).get
    assert(r5.isNullAt(1) && r5.isNullAt(2))
  }

  test("file-level CoW: no NMBS clause leaves unmatched files untouched") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("mi-cow"), "mc", schema, Seq.empty)
    t.append(Seq((1L, "a", 10L)).toDF("id", "v", "n").coalesce(1))
    t.append(Seq((2L, "b", 20L)).toDF("id", "v", "n").coalesce(1))
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    t.mergeInto(Seq((1L, 99L)).toDF("sid", "sn"),
      keys = Seq("id" -> col("sid")),
      matched = Seq(MergeClause.Update(None, Seq("n" -> src("sn")))))
    val after = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert(before.intersect(after).size === 1, "unmatched file must survive")
    assert(state(t) === Seq((1L, "a", 99L), (2L, "b", 20L)))
  }

  test("clause-kind validation") {
    import spark.implicits._
    val t = fixture("mi-bad")
    val source = Seq((1L, 1L)).toDF("sid", "sn")
    intercept[IllegalArgumentException] {
      t.mergeInto(source, Seq("id" -> col("sid")),
        matched = Seq(MergeClause.Insert(None, Seq("id" -> src("sid")))))
    }
    intercept[IllegalArgumentException] {
      t.mergeInto(source, Seq("id" -> col("sid")),
        notMatched = Seq(MergeClause.Delete(None)))
    }
    intercept[IllegalArgumentException] {
      t.mergeInto(source, Seq("id" -> col("sid")),
        notMatchedBySource = Seq(MergeClause.Insert(None, Seq())))
    }
    intercept[IllegalArgumentException] {
      t.mergeInto(Seq((1L, 1L), (1L, 2L)).toDF("sid", "sn"),
        Seq("id" -> col("sid")),
        matched = Seq(MergeClause.Update(None, Seq("n" -> src("sn")))))
    }
  }
}
