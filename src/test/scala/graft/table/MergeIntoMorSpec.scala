package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.table.MergeClause.src

/**
 * Merge-on-read twin of the general MERGE ([[GraftTable.mergeIntoMoR]]):
 * every scenario must land on the SAME state the CoW rewrite produces,
 * with the MoR commit shape — one equality-delete file of exactly the
 * touched rows' keys plus an append, never a data-file rewrite.
 */
class MergeIntoMorSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("n", LongType)))

  private def fixture(name: String, mor: Boolean): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(name), name, schema)
    t.append(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("id", "v", "n"))
    t
  }

  private def state(t: GraftTable): Seq[(Long, String, Long)] = {
    import spark.implicits._
    t.toDF.orderBy("id").as[(Long, String, Long)].collect().toSeq
  }

  private def bothWays(name: String)(
      run: (GraftTable, Boolean) => Unit): Unit = {
    val cow = fixture(s"$name-cow", mor = false)
    val mor = fixture(s"$name-mor", mor = true)
    run(cow, false)
    run(mor, true)
    assert(state(mor) === state(cow), "MoR must land on the CoW state")
  }

  test("conditional + multi-clause + insert: MoR state equals CoW state") {
    import spark.implicits._
    bothWays("mim-multi") { (t, isMor) =>
      val source = Seq((1L, 0L), (2L, 99L), (3L, 1L), (8L, 80L))
        .toDF("sid", "sn")
      val doIt: (GraftTable, org.apache.spark.sql.DataFrame) => GraftSnapshot =
        if (isMor) (tt, s) => tt.mergeIntoMoR(s, Seq("id" -> col("sid")),
          matched = Seq(
            MergeClause.Delete(Some(src("sn") === 0L)),
            MergeClause.Update(Some(src("sn") > 10L), Seq("n" -> src("sn"))),
            MergeClause.Update(None, Seq("v" -> lit("low")))),
          notMatched = Seq(MergeClause.Insert(Some(src("sn") > 50L),
            Seq("id" -> src("sid"), "v" -> lit("new"), "n" -> src("sn")))))
        else (tt, s) => tt.mergeInto(s, Seq("id" -> col("sid")),
          matched = Seq(
            MergeClause.Delete(Some(src("sn") === 0L)),
            MergeClause.Update(Some(src("sn") > 10L), Seq("n" -> src("sn"))),
            MergeClause.Update(None, Seq("v" -> lit("low")))),
          notMatched = Seq(MergeClause.Insert(Some(src("sn") > 50L),
            Seq("id" -> src("sid"), "v" -> lit("new"), "n" -> src("sn")))))
      doIt(t, source)
    }
  }

  test("NOT MATCHED BY SOURCE: MoR state equals CoW state") {
    import spark.implicits._
    bothWays("mim-nmbs") { (t, isMor) =>
      val source = Seq((1L, 11L)).toDF("sid", "sn")
      val keys = Seq("id" -> col("sid"))
      val matched = Seq(MergeClause.Update(None, Seq("n" -> src("sn"))))
      val nmbs = Seq(
        MergeClause.Delete(Some(col("n") >= 40L)),
        MergeClause.Update(None, Seq("v" -> lit("stale"))))
      if (isMor) t.mergeIntoMoR(source, keys, matched,
        notMatchedBySource = nmbs)
      else t.mergeInto(source, keys, matched, notMatchedBySource = nmbs)
    }
  }

  test("MoR commit shape: equality-delete file of the TOUCHED keys only, no rewrite") {
    import spark.implicits._
    val t = fixture("mim-shape", mor = true)
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    val source = Seq((1L, 100L), (2L, 5L), (9L, 90L)).toDF("sid", "sn")
    t.mergeIntoMoR(source, Seq("id" -> col("sid")),
      matched = Seq(MergeClause.Update(Some(src("sn") > col("n")),
        Seq("n" -> src("sn")))),
      notMatched = Seq(MergeClause.Insert(None,
        Seq("id" -> src("sid"), "v" -> lit("i"), "n" -> src("sn")))))
    val snap = t.meta.currentSnapshot.get
    // no pre-existing data file was rewritten or removed
    assert(snap.removedFiles.isEmpty)
    assert(before.subsetOf(snap.files.map(_.path).toSet))
    // the delete file carries exactly the touched key (id=1; id=2's
    // condition was false so it must NOT pay a delete entry)
    val dels = snap.deleteFiles.filter(_.seq == snap.id)
    assert(dels.size === 1)
    assert(state(t) === Seq((1L, "a", 100L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L), (9L, "i", 90L)))
    // reading through the delete: id=1 appears exactly once
    assert(t.toDF.filter(col("id") === 1L).count() === 1L)
    assert(dels.head.records === 1L,
      s"only the fired row's key enters the delete file, got ${dels.head.records}")
  }

  test("SQL general MERGE routes to MoR on write.merge.mode=merge-on-read") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("mim-sql-wh").toString
    spark.conf.set("spark.sql.catalog.mimsql",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.mimsql.warehouse", wh)
    spark.sql("""CREATE TABLE mimsql.fin.g (id BIGINT, amount DOUBLE)
                 USING parquet TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO mimsql.fin.g VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    val t = GraftTable.load(spark, s"$wh/fin/g")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 100.0),
                   (CAST(9 AS BIGINT), 90.0)) AS s(id, amount)""")
      .createOrReplaceTempView("mim_src")
    spark.sql("""MERGE INTO mimsql.fin.g t USING mim_src s ON t.id = s.id
                 WHEN MATCHED AND s.amount > t.amount
                   THEN UPDATE SET t.amount = s.amount
                 WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)""")
    val snap = t.meta.currentSnapshot.get
    assert(snap.removedFiles.isEmpty &&
      before.subsetOf(snap.files.map(_.path).toSet),
      "merge-on-read mode must not rewrite data files")
    assert(snap.deleteFiles.exists(_.seq == snap.id))
    val rows = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq === Seq((1L, 100.0), (2L, 20.0), (3L, 30.0), (9L, 90.0)))

    // the SIMPLE-path shape (unconditional WHEN MATCHED THEN DELETE) must
    // also route to the MoR rewrite instead of erroring — behavior must
    // not depend on whether the clause happens to carry a condition
    val before2 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""SELECT CAST(9 AS BIGINT) AS id, 0.0 AS amount""")
      .createOrReplaceTempView("mim_del_src")
    spark.sql("""MERGE INTO mimsql.fin.g t USING mim_del_src s ON t.id = s.id
                 WHEN MATCHED THEN DELETE""")
    val snap2 = t.meta.currentSnapshot.get
    assert(snap2.removedFiles.isEmpty &&
      before2.subsetOf(snap2.files.map(_.path).toSet),
      "MATCHED DELETE under merge-on-read must not rewrite data files")
    assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 3L))
  }

  test("mergeIntoMoR rejects unknown SET/INSERT columns like the CoW route") {
    import spark.implicits._
    val t = fixture("mim-unknown-col", mor = true)
    val srcDf = Seq((1L, "z", 99L)).toDF("id", "v", "n")
    val e = intercept[IllegalArgumentException] {
      t.mergeIntoMoR(srcDf, Seq("id" -> col("id")),
        matched = Seq(MergeClause.Update(None, Seq("v_typo" -> src("v")))))
    }
    assert(e.getMessage.contains("unknown column v_typo"))
    val e2 = intercept[IllegalArgumentException] {
      t.mergeIntoMoR(srcDf, Seq("id" -> col("id")),
        notMatched = Seq(MergeClause.Insert(None,
          Seq("id" -> src("id"), "nope" -> src("n")))))
    }
    assert(e2.getMessage.contains("unknown column nope"))
    assert(state(t) === Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)), "failed validation must not commit")
  }
}
