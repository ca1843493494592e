package graft.sql

import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

import graft.SparkTestBase
import graft.table.GraftTable
import graft.table.catalog.GraftSparkCatalog

/** `MERGE INTO … WITH SCHEMA EVOLUTION` (round 17): graft tables declare
  * `AUTOMATIC_SCHEMA_EVOLUTION`, so Spark's analyzer routes the
  * source-vs-target schema delta through the catalog's alterTable —
  * AddColumn for new source columns, UpdateColumnType for safe widens —
  * and the merge then runs against the evolved schema. Existing files
  * read the added column as NULL (and the pre-promotion era type) via
  * the standard evolution read path; no file rewrites beyond the merge's
  * own. Covers star and explicit assignments, CoW and merge-on-read,
  * type widening, the no-evolution control, and the unsafe-change
  * refusal. */
class MergeSchemaEvolutionSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft-mse-wh").toString
    spark.conf.set("spark.sql.catalog.mse", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.mse.warehouse", wh)
    wh
  }

  /** target: (id BIGINT, amount DOUBLE) ids 0..5, amount id*10;
    * source view `<name>_src`: ids 4,5,6,7 with amount id+0.5 AND an
    * extra `note` column the target does not have. */
  private def fixtures(name: String, props: String = ""): GraftTable = {
    warehouse
    spark.sql(s"""CREATE TABLE mse.db.$name (id BIGINT, amount DOUBLE)
                  USING parquet $props""")
    spark.sql(s"INSERT INTO mse.db.$name SELECT id, id * 10.0 FROM range(6)")
    spark.sql("""SELECT id, CAST(id + 0.5 AS DOUBLE) AS amount,
                   concat('n', id) AS note
                 FROM (VALUES (CAST(4 AS BIGINT)), (5), (6), (7)) v(id)""")
      .createOrReplaceTempView(s"${name}_src")
    GraftTable.load(spark, s"$warehouse/db/$name")
  }

  private def state(name: String): Seq[(Long, Double, Option[String])] =
    spark.sql(s"SELECT id, amount, note FROM mse.db.$name ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)))).toSeq

  test("UPDATE SET * / INSERT * evolve the schema: new source column lands, old rows read NULL") {
    val t = fixtures("star")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.star t
                 USING star_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(t.meta.schemaJson).asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq === Seq("id", "amount", "note"))
    assert(state("star") === Seq(
      (0L, 0.0, None), (1L, 10.0, None), (2L, 20.0, None), (3L, 30.0, None),
      (4L, 4.5, Some("n4")), (5L, 5.5, Some("n5")),
      (6L, 6.5, Some("n6")), (7L, 7.5, Some("n7"))))
    assert(t.meta.currentSnapshot.get.operation === "merge")
  }

  test("explicit assignment to the new column; merge-on-read mode") {
    val t = fixtures("morx",
      "TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.morx t
                 USING morx_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET note = s.note
                 WHEN NOT MATCHED THEN INSERT (id, amount, note)
                   VALUES (s.id, s.amount, s.note)""")
    val snap = t.meta.currentSnapshot.get
    assert(before.subsetOf(snap.files.map(_.path).toSet),
      "MoR merge appends, never rewrites")
    assert(snap.deleteFiles.nonEmpty)
    assert(state("morx") === Seq(
      (0L, 0.0, None), (1L, 10.0, None), (2L, 20.0, None), (3L, 30.0, None),
      (4L, 40.0, Some("n4")), (5L, 50.0, Some("n5")),
      (6L, 6.5, Some("n6")), (7L, 7.5, Some("n7"))))
  }

  test("safe type widening: source BIGINT over target INT promotes the column") {
    warehouse
    spark.sql("CREATE TABLE mse.db.widen (id BIGINT, n INT) USING parquet")
    spark.sql("INSERT INTO mse.db.widen SELECT id, CAST(id AS INT) FROM range(4)")
    spark.sql("""SELECT id, CAST(id * 1000000000000 AS BIGINT) AS n
                 FROM (VALUES (CAST(2 AS BIGINT)), (9)) v(id)""")
      .createOrReplaceTempView("widen_src")
    val t = GraftTable.load(spark, s"$warehouse/db/widen")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.widen t
                 USING widen_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(t.meta.schemaJson).asInstanceOf[StructType]
    assert(schema("n").dataType === LongType)
    assert(schema("id").dataType === LongType)
    // pre-merge files keep INT physically; the era read upcasts
    val rows = spark.sql("SELECT id, n FROM mse.db.widen ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((0L, 0L), (1L, 1L), (2L, 2000000000000L), (3L, 3L),
      (9L, 9000000000000L)))
  }

  test("control: the same merge WITHOUT the clause does not evolve (and cannot reference the new column)") {
    val t = fixtures("ctrl")
    val err = intercept[Exception] {
      spark.sql("""MERGE INTO mse.db.ctrl t USING ctrl_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET note = s.note""")
    }
    assert(err.getMessage.toLowerCase.contains("note"))
    // star without evolution aligns to the target's columns only
    spark.sql("""MERGE INTO mse.db.ctrl t USING ctrl_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(t.meta.schemaJson).asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq === Seq("id", "amount"),
      "no WITH SCHEMA EVOLUTION -> no schema change")
    assert(schema("id").dataType === LongType)
    val rows = spark.sql("SELECT id, amount FROM mse.db.ctrl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((0L, 0.0), (1L, 10.0), (2L, 20.0), (3L, 30.0),
      (4L, 4.5), (5L, 5.5), (6L, 6.5), (7L, 7.5)))
  }

  test("a tombstoned (renamed-away) name cannot be re-added by evolution: old files still store data under it") {
    val t = fixtures("tomb")
    t.renameColumn("amount", "amt")
    // a source column named after the tombstone would be ADDED by the
    // star-merge's evolution — but name-based resolution would then read
    // the RENAMED column's stale data out of the pre-rename files, so
    // addColumn (and therefore the whole evolution) refuses
    spark.sql("""SELECT CAST(1 AS BIGINT) AS id, CAST(1.5 AS DOUBLE) AS amt,
                   CAST(99.0 AS DOUBLE) AS amount""")
      .createOrReplaceTempView("tomb_evo_src")
    val err = intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.tomb t
                   USING tomb_evo_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(err.getMessage.contains("renamed or dropped"),
      s"expected the tombstone refusal, got: ${err.getMessage}")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(t.meta.schemaJson).asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq === Seq("id", "amt"))
  }

  test("unsafe change (source STRING over target INT) fails loudly, nothing committed") {
    warehouse
    spark.sql("CREATE TABLE mse.db.unsafe (id BIGINT, n INT) USING parquet")
    spark.sql("INSERT INTO mse.db.unsafe SELECT id, CAST(id AS INT) FROM range(3)")
    spark.sql("""SELECT CAST(1 AS BIGINT) AS id, 'oops' AS n""")
      .createOrReplaceTempView("unsafe_src")
    val t = GraftTable.load(spark, s"$warehouse/db/unsafe")
    val snapBefore = t.meta.currentSnapshot.get.id
    intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.unsafe t
                   USING unsafe_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *""")
    }
    val m = GraftTable.load(spark, s"$warehouse/db/unsafe").meta
    assert(m.currentSnapshot.get.id === snapBefore)
    assert(org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
      .asInstanceOf[StructType].apply("n").dataType === IntegerType)
  }
}
