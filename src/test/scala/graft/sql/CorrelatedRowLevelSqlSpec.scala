package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.GraftTable
import graft.table.catalog.GraftSparkCatalog

/** Correlated subqueries in row-level SQL (round 16): `DELETE/UPDATE …
  * WHERE EXISTS (SELECT … WHERE k.id = t.id)` and correlated IN — the
  * retention-pipeline shapes — route through [[CorrelatedCondition]]'s
  * exprId-preserving re-bind into the position-keyed CoW/MoR commits.
  * MERGE clause correlation and correlated SET values stay refused. */
class CorrelatedRowLevelSqlSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft-corr-wh").toString
    spark.conf.set("spark.sql.catalog.corr", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.corr.warehouse", wh)
    wh
  }

  /** 10 rows over two partitions; a side table blessing ids {2, 5, 8}. */
  private def fixtures(name: String, props: String = ""): GraftTable = {
    warehouse
    spark.sql(s"""CREATE TABLE corr.db.$name
                  (id BIGINT, amount DOUBLE, part STRING)
                  USING parquet PARTITIONED BY (part) $props""")
    spark.sql(s"""INSERT INTO corr.db.$name SELECT id, id * 10.0,
                  CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END
                  FROM range(10)""")
    spark.sql(s"""SELECT * FROM (VALUES (CAST(2 AS BIGINT)), (CAST(5 AS BIGINT)),
                  (CAST(8 AS BIGINT))) AS s(kid)""")
      .createOrReplaceTempView(s"${name}_keep")
    GraftTable.load(spark, s"$warehouse/db/$name")
  }

  private def ids(name: String): Seq[Long] =
    spark.sql(s"SELECT id FROM corr.db.$name ORDER BY id")
      .collect().map(_.getLong(0)).toSeq

  test("DELETE WHERE EXISTS correlated: CoW rewrite of exactly the affected files") {
    val t = fixtures("dex")
    spark.sql("""DELETE FROM corr.db.dex t
                 WHERE EXISTS (SELECT 1 FROM dex_keep k WHERE k.kid = t.id)""")
    assert(ids("dex") === Seq(0L, 1L, 3L, 4L, 6L, 7L, 9L))
    assert(t.meta.currentSnapshot.get.operation === "delete")
    assert(t.meta.currentSnapshot.get.deleteFiles.isEmpty, "CoW: no delete files")
  }

  test("DELETE WHERE NOT EXISTS correlated keeps only the blessed ids") {
    fixtures("dnex")
    spark.sql("""DELETE FROM corr.db.dnex t
                 WHERE NOT EXISTS (SELECT 1 FROM dnex_keep k WHERE k.kid = t.id)""")
    assert(ids("dnex") === Seq(2L, 5L, 8L))
  }

  test("DELETE with a correlated IN and an extra inner predicate") {
    fixtures("din")
    // correlation through the IN's inner WHERE, not the IN columns
    spark.sql("""DELETE FROM corr.db.din t
                 WHERE t.id IN (SELECT k.kid FROM din_keep k WHERE k.kid < t.amount)""")
    // every blessed id satisfies kid < id*10 (2<20, 5<50, 8<80)
    assert(ids("din") === Seq(0L, 1L, 3L, 4L, 6L, 7L, 9L))
  }

  test("DELETE WHERE EXISTS under merge-on-read commits position deletes, no rewrite") {
    val t = fixtures("dmor",
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""DELETE FROM corr.db.dmor t
                 WHERE EXISTS (SELECT 1 FROM dmor_keep k WHERE k.kid = t.id)""")
    val snap = t.meta.currentSnapshot.get
    assert(snap.files.map(_.path).toSet === before, "MoR must not rewrite files")
    assert(snap.deleteFiles.nonEmpty &&
      snap.deleteFiles.forall(_.kind == "position"),
      "correlated MoR deletes commit as position deletes")
    assert(ids("dmor") === Seq(0L, 1L, 3L, 4L, 6L, 7L, 9L))
  }

  test("self-referencing correlation: same-named inner columns never capture the outer reference") {
    fixtures("dself")
    // delete every row whose id+1 also exists — inner scan is the SAME
    // table with the SAME column names; a name-based re-bind would match
    // t2.id to the outer t.id and delete everything
    spark.sql("""DELETE FROM corr.db.dself t
                 WHERE EXISTS (SELECT 1 FROM corr.db.dself t2
                               WHERE t2.id = t.id + 1)""")
    assert(ids("dself") === Seq(9L), "only the chain's last id survives")
  }

  test("UPDATE WHERE EXISTS correlated: CoW rewrite applies SET on exactly the matched rows") {
    val t = fixtures("uex")
    spark.sql("""UPDATE corr.db.uex t SET amount = -1.0
                 WHERE EXISTS (SELECT 1 FROM uex_keep k WHERE k.kid = t.id)""")
    val got = spark.sql("SELECT id, amount FROM corr.db.uex ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === (0L until 10L).map(i =>
      (i, if (Set(2L, 5L, 8L).contains(i)) -1.0 else i * 10.0)))
    assert(t.meta.currentSnapshot.get.operation === "update")
  }

  test("UPDATE correlated WHERE under merge-on-read: position deletes + updated versions") {
    val t = fixtures("umor",
      "TBLPROPERTIES ('write.update.mode'='merge-on-read')")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""UPDATE corr.db.umor t SET amount = 0.0
                 WHERE t.id IN (SELECT k.kid FROM umor_keep k WHERE k.kid = t.id)""")
    val snap = t.meta.currentSnapshot.get
    assert(before.subsetOf(snap.files.map(_.path).toSet),
      "MoR update appends, never rewrites")
    assert(snap.deleteFiles.nonEmpty &&
      snap.deleteFiles.forall(_.kind == "position"))
    val got = spark.sql("SELECT id, amount FROM corr.db.umor ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === (0L until 10L).map(i =>
      (i, if (Set(2L, 5L, 8L).contains(i)) 0.0 else i * 10.0)))
  }

  test("correlated scalar-subquery comparison in WHERE decorrelates too") {
    fixtures("dscal")
    spark.sql("""SELECT CAST(id AS BIGINT) AS gid, CAST(id % 3 AS DOUBLE) AS cap
                 FROM range(10)""").createOrReplaceTempView("dscal_caps")
    // amount > (scalar per-row lookup): deletes rows with id*10 > id%3
    spark.sql("""DELETE FROM corr.db.dscal t
                 WHERE t.amount > (SELECT c.cap FROM dscal_caps c
                                   WHERE c.gid = t.id)""")
    assert(ids("dscal") === Seq(0L), "only id 0 has amount <= its cap")
  }

  test("a no-op correlated DELETE commits an empty delete snapshot") {
    val t = fixtures("dnone")
    spark.sql("""DELETE FROM corr.db.dnone t
                 WHERE EXISTS (SELECT 1 FROM dnone_keep k WHERE k.kid = t.id + 100)""")
    assert(ids("dnone") === (0L until 10L))
    assert(t.meta.currentSnapshot.get.operation === "delete")
    assert(t.meta.currentSnapshot.get.addedFiles.isEmpty)
  }

  test("correlated MERGE clause conditions now plan (round 17); non-scalar correlated SET value stays refused") {
    fixtures("ref1")
    spark.sql("SELECT CAST(2 AS BIGINT) AS id, 9.0 AS amount")
      .createOrReplaceTempView("ref1_src")
    // full coverage in CorrelatedMergeSqlSpec; this pins the routing
    spark.sql("""MERGE INTO corr.db.ref1 t USING ref1_src s ON t.id = s.id
                 WHEN MATCHED AND EXISTS (SELECT 1 FROM ref1_keep k
                                          WHERE k.kid = t.id)
                   THEN UPDATE SET t.amount = s.amount""")
    assert(spark.sql("SELECT amount FROM corr.db.ref1 WHERE id = 2")
      .collect().head.getDouble(0) === 9.0)
    // a PREDICATE subquery in a SET value (correlated EXISTS inside a
    // CASE) is not a value — refused, not mis-planned
    val set = intercept[Exception] {
      spark.sql("""UPDATE corr.db.ref1 t
                   SET amount = CASE WHEN EXISTS (SELECT 1 FROM ref1_keep k
                                                  WHERE k.kid = t.id)
                                     THEN 1.0 ELSE 0.0 END""")
    }
    assert(set.getMessage.contains("only scalar subqueries"), set.getMessage)
  }

  test("UPDATE SET with a correlated scalar subquery: per-row enrichment, NULL on no match") {
    val t = fixtures("uset")
    // no WHERE: every row updates; blessed ids get kid*100, others NULL —
    // standard scalar-subquery semantics
    spark.sql("""UPDATE corr.db.uset t
                 SET amount = (SELECT k.kid * 100.0 FROM uset_keep k
                               WHERE k.kid = t.id)""")
    val got = spark.sql("SELECT id, amount FROM corr.db.uset ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(got === (0L until 10L).map(i =>
      (i, if (Set(2L, 5L, 8L).contains(i)) Some(i * 100.0) else None)))
    assert(t.meta.currentSnapshot.get.operation === "update")
  }

  test("UPDATE SET correlated scalar + plain WHERE: only matched rows touched") {
    fixtures("usetw")
    spark.sql("""UPDATE corr.db.usetw t
                 SET amount = amount + (SELECT max(k.kid) FROM usetw_keep k
                                        WHERE k.kid >= t.id)
                 WHERE t.id < 3""")
    val got = spark.sql("SELECT id, amount FROM corr.db.usetw ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ids 0,1,2: amount + max(kid >= id) = id*10 + 8; others untouched
    assert(got === (0L until 10L).map(i =>
      (i, if (i < 3) i * 10.0 + 8.0 else i * 10.0)))
  }

  test("UPDATE SET correlated scalar under merge-on-read: position deletes + enriched versions") {
    val t = fixtures("usetmor",
      "TBLPROPERTIES ('write.update.mode'='merge-on-read')")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""UPDATE corr.db.usetmor t
                 SET amount = (SELECT k.kid * 7.0 FROM usetmor_keep k
                               WHERE k.kid = t.id)
                 WHERE EXISTS (SELECT 1 FROM usetmor_keep k WHERE k.kid = t.id)""")
    val snap = t.meta.currentSnapshot.get
    assert(before.subsetOf(snap.files.map(_.path).toSet),
      "MoR update appends, never rewrites")
    assert(snap.deleteFiles.nonEmpty &&
      snap.deleteFiles.forall(_.kind == "position"))
    val got = spark.sql("SELECT id, amount FROM corr.db.usetmor ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === (0L until 10L).map(i =>
      (i, if (Set(2L, 5L, 8L).contains(i)) i * 7.0 else i * 10.0)))
  }

  test("UPDATE SET scalar subquery: more than one inner row fails at run time") {
    fixtures("usetdup")
    spark.sql("""SELECT * FROM (VALUES (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)))
                 AS s(kid)""").createOrReplaceTempView("usetdup_dups")
    val e = intercept[Exception] {
      spark.sql("""UPDATE corr.db.usetdup t
                   SET amount = (SELECT k.kid * 1.0 FROM usetdup_dups k
                                 WHERE k.kid = t.id)""")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString("\n").toLowerCase
    assert(msgs.contains("more than one row"), msgs)
  }

  test("UPDATE SET scalar: same-named inner columns never capture the outer reference") {
    fixtures("usetself")
    // inner scan is the SAME table with the SAME column names: set each
    // row's amount to its successor's amount; a name-based re-bind would
    // match t2.id to the outer t.id and make every row self-referential
    spark.sql("""UPDATE corr.db.usetself t
                 SET amount = (SELECT max(t2.amount) FROM corr.db.usetself t2
                               WHERE t2.id = t.id + 1)""")
    val got = spark.sql("SELECT id, amount FROM corr.db.usetself ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(got === (0L until 10L).map(i =>
      (i, if (i < 9) Some((i + 1) * 10.0) else None)),
      "each row takes its successor's PRE-update amount; the last has none")
  }

  test("correlated delete through the graft API surface sees MoR-deleted inner state") {
    // the subquery's inner relation is a graft table with pending MoR
    // deletes: the run-time re-analysis must substitute the
    // delete-applying read inside the subquery, so retracted keys no
    // longer bless deletions
    val t = fixtures("dinner")
    warehouse
    spark.sql("""CREATE TABLE corr.db.dinner_keys (kid BIGINT) USING parquet
                 TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO corr.db.dinner_keys VALUES (2), (5), (8)")
    spark.sql("DELETE FROM corr.db.dinner_keys WHERE kid = 5")
    spark.sql("""DELETE FROM corr.db.dinner t
                 WHERE EXISTS (SELECT 1 FROM corr.db.dinner_keys k
                               WHERE k.kid = t.id)""")
    assert(ids("dinner") === Seq(0L, 1L, 3L, 4L, 5L, 6L, 7L, 9L),
      "id 5 survives: its blessing key was MoR-deleted before the delete ran")
    assert(t.meta.currentSnapshot.get.operation === "delete")
  }
}
