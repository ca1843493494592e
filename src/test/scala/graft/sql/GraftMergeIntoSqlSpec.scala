package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.GraftTable
import graft.table.catalog.GraftSparkCatalog

/**
 * The general SQL MERGE clause surface through `graft.GraftSparkExtensions`
 * (Spark 4's full `MergeIntoTable`: conditional clauses, several clauses
 * first-true-wins in order, `WHEN NOT MATCHED BY SOURCE`), routed by
 * [[GraftMergeRule]] to the conditional-cascade CoW rewrite.
 */
class GraftMergeIntoSqlSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft-gm-wh").toString
    spark.conf.set("spark.sql.catalog.gmrg", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmrg.warehouse", wh)
    wh
  }

  private def freshTable(name: String): GraftTable = {
    warehouse
    spark.sql(s"""CREATE TABLE gmrg.fin.$name
                  (id BIGINT, amount DOUBLE, category STRING) USING parquet""")
    spark.sql(s"""INSERT INTO gmrg.fin.$name VALUES
                  (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'c'), (4, 40.0, 'd')""")
    GraftTable.load(spark, s"$warehouse/fin/$name")
  }

  private def state(t: GraftTable): Seq[(Long, Double, String)] = {
    import spark.implicits._
    t.toDF.orderBy("id").as[(Long, Double, String)].collect().toSeq
  }

  test("conditional WHEN MATCHED AND over both sides") {
    val t = freshTable("g1")
    spark.sql("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 100.0),
                   (CAST(2 AS BIGINT), 5.0)) AS s(id, amount)""")
      .createOrReplaceTempView("g1_src")
    spark.sql("""MERGE INTO gmrg.fin.g1 t USING g1_src s ON t.id = s.id
                 WHEN MATCHED AND s.amount > t.amount
                   THEN UPDATE SET t.amount = s.amount""")
    assert(state(t) === Seq((1L, 100.0, "a"), (2L, 20.0, "b"),
      (3L, 30.0, "c"), (4L, 40.0, "d")))
  }

  test("multiple clauses in order: delete, conditional update, fallback") {
    val t = freshTable("g2")
    spark.sql("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 0.0),
                   (CAST(2 AS BIGINT), 99.0), (CAST(3 AS BIGINT), 1.0))
                 AS s(id, amount)""").createOrReplaceTempView("g2_src")
    spark.sql("""MERGE INTO gmrg.fin.g2 t USING g2_src s ON t.id = s.id
                 WHEN MATCHED AND s.amount = 0 THEN DELETE
                 WHEN MATCHED AND s.amount > 10 THEN UPDATE SET t.amount = s.amount
                 WHEN MATCHED THEN UPDATE SET t.category = 'low'""")
    assert(state(t) === Seq((2L, 99.0, "b"), (3L, 30.0, "low"), (4L, 40.0, "d")))
    assert(t.meta.currentSnapshot.get.operation === "merge")
  }

  test("WHEN NOT MATCHED BY SOURCE UPDATE and DELETE") {
    val t = freshTable("g3")
    spark.sql("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 11.0))
                 AS s(id, amount)""").createOrReplaceTempView("g3_src")
    spark.sql("""MERGE INTO gmrg.fin.g3 t USING g3_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.amount = s.amount
                 WHEN NOT MATCHED BY SOURCE AND t.amount >= 40 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.category = 'stale'""")
    assert(state(t) === Seq((1L, 11.0, "a"), (2L, 20.0, "stale"),
      (3L, 30.0, "stale")))
  }

  test("conditional INSERT + update value referencing the target row") {
    val t = freshTable("g4")
    spark.sql("""SELECT * FROM (VALUES (CAST(2 AS BIGINT), 200.0),
                   (CAST(8 AS BIGINT), 80.0), (CAST(9 AS BIGINT), 3.0))
                 AS s(id, amount)""").createOrReplaceTempView("g4_src")
    spark.sql("""MERGE INTO gmrg.fin.g4 t USING g4_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.amount = t.amount + s.amount
                 WHEN NOT MATCHED AND s.amount > 10
                   THEN INSERT (id, amount, category) VALUES (s.id, s.amount, 'new')""")
    assert(state(t) === Seq((1L, 10.0, "a"), (2L, 220.0, "b"), (3L, 30.0, "c"),
      (4L, 40.0, "d"), (8L, 80.0, "new")))
  }

  test("differing update vs insert expressions route to the general path") {
    val t = freshTable("g5")
    spark.sql("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 7.0),
                   (CAST(6 AS BIGINT), 60.0)) AS s(id, amount)""")
      .createOrReplaceTempView("g5_src")
    spark.sql("""MERGE INTO gmrg.fin.g5 t USING g5_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET t.amount = s.amount * 10
                 WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)""")
    val rows = state(t)
    assert(rows.map(r => (r._1, r._2)) === Seq((1L, 70.0), (2L, 20.0),
      (3L, 30.0), (4L, 40.0), (6L, 60.0)))
    assert(rows.find(_._1 == 6L).exists(_._3 == null)) // unlisted -> NULL
  }

  test("general path stays file-level CoW without NMBS clauses") {
    warehouse
    spark.sql("""CREATE TABLE gmrg.fin.g6 (id BIGINT, amount DOUBLE, part STRING)
                 USING parquet PARTITIONED BY (part)""")
    spark.sql("""INSERT INTO gmrg.fin.g6 VALUES
                 (1, 10.0, 'p1'), (2, 20.0, 'p2')""")
    val t = GraftTable.load(spark, s"$warehouse/fin/g6")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""SELECT * FROM (VALUES (CAST(2 AS BIGINT), 99.0))
                 AS s(id, amount)""").createOrReplaceTempView("g6_src")
    spark.sql("""MERGE INTO gmrg.fin.g6 t USING g6_src s ON t.id = s.id
                 WHEN MATCHED AND s.amount > 0 THEN UPDATE SET t.amount = s.amount""")
    val after = t.meta.currentSnapshot.get.files.map(_.path).toSet
    val p1 = before.filter(_.contains("part=p1"))
    assert(p1.nonEmpty && p1.subsetOf(after), "unmatched partition must survive")
    assert(before.filter(_.contains("part=p2")).intersect(after).isEmpty)
  }

  test("duplicate source keys still rejected on the general path") {
    freshTable("g7")
    spark.sql("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 1.0),
                   (CAST(1 AS BIGINT), 2.0)) AS s(id, amount)""")
      .createOrReplaceTempView("g7_src")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gmrg.fin.g7 t USING g7_src s ON t.id = s.id
                   WHEN MATCHED AND s.amount > 0 THEN UPDATE SET t.amount = s.amount""")
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
