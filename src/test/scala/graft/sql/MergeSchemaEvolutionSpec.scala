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

  test("partitioned target: evolution must not remap the partition column onto the new column (positional-remap repair)") {
    warehouse
    // the relation lists identity partition columns LAST, so the added
    // column lands BEFORE `part` — the analyzer's positional post-swap
    // remap would hand `part` the new column's exprId and type, and the
    // aligner then casts the part VALUE to that wrong type (or silently
    // swaps two same-typed columns). GraftMergeRule.repairEvolutionRemap
    // re-binds by name; this pins the exact failing shape.
    spark.sql("""CREATE TABLE mse.db.prt (id BIGINT, v DOUBLE, part STRING)
                 USING parquet PARTITIONED BY (part)""")
    spark.sql("""INSERT INTO mse.db.prt SELECT id, id*10.0,
                 CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END FROM range(4)""")
    spark.sql("""SELECT CAST(2 AS BIGINT) AS id, CAST(2.5 AS DOUBLE) AS v,
                 'even' AS part, CAST(777 AS BIGINT) AS c1""")
      .createOrReplaceTempView("prt_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.prt t
                 USING prt_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT id, v, part, c1 FROM mse.db.prt ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(rows === Seq((0L, 0.0, "even", -1L), (1L, 10.0, "odd", -1L),
      (2L, 2.5, "even", 777L), (3L, 30.0, "odd", -1L)))
  }

  test("partitioned target, same-typed columns: evolution must not silently swap values") {
    warehouse
    // the silent twin of the cast failure: when the displaced partition
    // column and the new column share a type, the mangled alignment
    // swaps VALUES without any runtime error — only the state check
    // catches it (this is what the evolution fuzz first surfaced)
    spark.sql("""CREATE TABLE mse.db.prs (id BIGINT, part STRING)
                 USING parquet PARTITIONED BY (part)""")
    spark.sql("""INSERT INTO mse.db.prs SELECT id,
                 CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END FROM range(4)""")
    spark.sql("""SELECT CAST(9 AS BIGINT) AS id, 'odd' AS part,
                 'tag9' AS tag""").createOrReplaceTempView("prs_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mse.db.prs t
                 USING prs_src s ON t.id = s.id
                 WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT id, part, tag FROM mse.db.prs WHERE id = 9")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((9L, "odd", "tag9")),
      s"part/tag values must not swap: $got")
  }

  // r18 budget trim: the default run fuzzes the MoR-unpartitioned and
  // CoW-partitioned trials (the two mode axes crossed); the other two
  // combinations are tagged slow. Each trial keeps its own model, so a
  // subset is self-consistent.
  test("fuzz: repeated evolution merges (MoR / partitioned CoW) match a row model") {
    evolutionFuzz(Seq(2, 3))
  }
  test("fuzz: evolution merges, remaining mode combinations (slow)",
      graft.SlowTest) {
    evolutionFuzz(Seq(1, 4))
  }

  private def evolutionFuzz(trials: Seq[Int]): Unit = {
    warehouse
    val rnd = new scala.util.Random(41)
    for (trial <- trials) {
      val mor = trial % 2 == 0
      val parted = trial >= 3
      val name = s"fz$trial"
      val props =
        if (mor) "TBLPROPERTIES ('write.merge.mode'='merge-on-read')" else ""
      val partBy = if (parted) "PARTITIONED BY (part)" else ""
      spark.sql(s"""CREATE TABLE mse.db.$name
                    (id BIGINT, v DOUBLE, part STRING)
                    USING parquet $partBy $props""")
      // model: id -> (v, extras by column name); extras absent = NULL
      val model = scala.collection.mutable.Map.empty[Long, (Double, Map[String, Long])]
      val extraCols = scala.collection.mutable.ArrayBuffer.empty[String]
      def partOf(id: Long) = if (id % 2 == 0) "even" else "odd"
      // seed rows
      (0L until 8L).foreach(i => model(i) = (i * 10.0, Map.empty))
      spark.sql(s"""INSERT INTO mse.db.$name
                    SELECT id, id * 10.0,
                      CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END
                    FROM range(8)""")
      (1 to 5).foreach { step =>
        val addNew = extraCols.size < 3 && rnd.nextBoolean()
        if (addNew) extraCols += s"c${extraCols.size + 1}"
        // source: a random id slice, all known extras + the new one
        val ids = (0L until 14L).filter(_ => rnd.nextBoolean())
        if (ids.nonEmpty) {
          val extraSel = extraCols.map(c =>
            s"id * ${c.drop(1)} AS $c").mkString(", ")
          // CAST: bigint + 0.5 types as decimal(22,1), and the analyzer
          // would then propose the UNSAFE double -> decimal widen, which
          // alterTable refuses loudly (correct; pinned by the unsafe test)
          val sel = s"id, CAST(id + 0.5 AS DOUBLE) AS v, " +
            s"CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS part" +
            (if (extraCols.nonEmpty) s", $extraSel" else "")
          spark.sql(s"SELECT $sel FROM (VALUES ${ids.map(i => s"(CAST($i AS BIGINT))").mkString(",")} ) t(id)")
            .createOrReplaceTempView(s"${name}_s$step")
          spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO mse.db.$name t
                        USING ${name}_s$step s ON t.id = s.id
                        WHEN MATCHED THEN UPDATE SET *
                        WHEN NOT MATCHED THEN INSERT *""")
          val extras = extraCols.map(c => c -> 0L).toMap
          ids.foreach { i =>
            model(i) = (i + 0.5,
              extraCols.map(c => c -> i * c.drop(1).toLong).toMap)
          }
          // rows untouched this step keep their old extras (absent = NULL)
          val _ = extras
        }
        // model vs table, every declared column
        val cols = Seq("id", "v", "part") ++ extraCols
        val got = spark.sql(
          s"SELECT ${cols.mkString(",")} FROM mse.db.$name ORDER BY id")
          .collect().map { r =>
            val extras = extraCols.zipWithIndex.flatMap { case (c, k) =>
              if (r.isNullAt(3 + k)) None else Some(c -> r.getLong(3 + k))
            }.toMap
            (r.getLong(0), r.getDouble(1), r.getString(2), extras)
          }.toSeq
        val want = model.toSeq.sortBy(_._1).map { case (i, (v, ex)) =>
          (i, v, partOf(i), ex) }
        assert(got === want,
          s"trial $trial step $step (mor=$mor parted=$parted): " +
            s"table diverged from model\n got=$got\nwant=$want")
      }
    }
  }
}
