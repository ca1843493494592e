package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.GraftTable
import graft.table.catalog.GraftSparkCatalog

/** Correlated subqueries in MERGE clause conditions and values (round
  * 17): each captured expression re-binds by exprId onto the merge's
  * joined frame (target columns bare, source columns `__s_`-prefixed),
  * where Spark 4 plans correlated predicate AND scalar subqueries under
  * Project — so the existing conditional cascade executes them as stock
  * existence/left-outer joins. Covers CoW and merge-on-read, both
  * correlation sides, the name-capture trap, and the remaining refusals
  * (ON keys; non-scalar values). */
class CorrelatedMergeSqlSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft-corrm-wh").toString
    spark.conf.set("spark.sql.catalog.corrm", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.corrm.warehouse", wh)
    wh
  }

  /** target: ids 0..9, amount id*10, two partitions; source view `<name>_src`:
    * ids 2,5,8,100 with amount id+0.5; keep view `<name>_keep`: kids {2, 8, 100}. */
  private def fixtures(name: String, props: String = ""): GraftTable = {
    warehouse
    spark.sql(s"""CREATE TABLE corrm.db.$name
                  (id BIGINT, amount DOUBLE, part STRING)
                  USING parquet PARTITIONED BY (part) $props""")
    spark.sql(s"""INSERT INTO corrm.db.$name SELECT id, id * 10.0,
                  CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END
                  FROM range(10)""")
    spark.sql(s"""SELECT id, CAST(id + 0.5 AS DOUBLE) AS amount
                  FROM (VALUES (CAST(2 AS BIGINT)), (5), (8), (100)) v(id)""")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"""SELECT * FROM (VALUES (CAST(2 AS BIGINT)), (8), (100))
                  k(kid)""").createOrReplaceTempView(s"${name}_keep")
    GraftTable.load(spark, s"$warehouse/db/$name")
  }

  private def state(name: String): Seq[(Long, Option[Double])] =
    spark.sql(s"SELECT id, amount FROM corrm.db.$name ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq

  test("WHEN MATCHED AND EXISTS (correlated on target) THEN UPDATE — CoW") {
    val t = fixtures("mex")
    spark.sql("""MERGE INTO corrm.db.mex t USING mex_src s ON t.id = s.id
                 WHEN MATCHED AND EXISTS (SELECT 1 FROM mex_keep k
                                          WHERE k.kid = t.id)
                   THEN UPDATE SET amount = s.amount""")
    // matched ids {2,5,8}; blessed {2,8} take the source amount, 5 stays
    assert(state("mex") === (0L until 10L).map(i =>
      (i, Some(if (i == 2L || i == 8L) i + 0.5 else i * 10.0))))
    assert(t.meta.currentSnapshot.get.operation === "merge")
  }

  test("WHEN MATCHED AND correlated on the SOURCE side — merge-on-read") {
    val t = fixtures("mmor",
      "TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    val before = t.meta.currentSnapshot.get.files.map(_.path).toSet
    spark.sql("""MERGE INTO corrm.db.mmor t USING mmor_src s ON t.id = s.id
                 WHEN MATCHED AND EXISTS (SELECT 1 FROM mmor_keep k
                                          WHERE k.kid = s.id)
                   THEN UPDATE SET amount = -1.0""")
    val snap = t.meta.currentSnapshot.get
    assert(before.subsetOf(snap.files.map(_.path).toSet),
      "MoR merge appends, never rewrites")
    assert(snap.deleteFiles.nonEmpty)
    assert(state("mmor") === (0L until 10L).map(i =>
      (i, Some(if (i == 2L || i == 8L) -1.0 else i * 10.0))))
  }

  test("correlated SCALAR subquery in an UPDATE value; correlated condition on a DELETE clause") {
    fixtures("mval")
    spark.sql("""MERGE INTO corrm.db.mval t USING mval_src s ON t.id = s.id
                 WHEN MATCHED AND EXISTS (SELECT 1 FROM mval_keep k
                                          WHERE k.kid = t.id AND k.kid < 5)
                   THEN DELETE
                 WHEN MATCHED
                   THEN UPDATE SET amount = (SELECT max(k.kid) * 1000.0
                                             FROM mval_keep k
                                             WHERE k.kid <= t.id)""")
    // id 2 deletes (blessed < 5); ids 5, 8 take max(kid <= id)*1000 = 2000, 8000
    assert(state("mval") === (0L until 10L).filterNot(_ == 2L).map(i =>
      (i, Some(i match {
        case 5L => 2000.0
        case 8L => 8000.0
        case _ => i * 10.0
      }))))
  }

  test("NOT MATCHED: correlated condition and correlated scalar INSERT value over the source") {
    fixtures("mins")
    spark.sql("""MERGE INTO corrm.db.mins t USING mins_src s ON t.id = s.id
                 WHEN NOT MATCHED AND EXISTS (SELECT 1 FROM mins_keep k
                                              WHERE k.kid = s.id)
                   THEN INSERT (id, amount, part)
                   VALUES (s.id,
                           (SELECT max(k.kid) * 2.0 FROM mins_keep k
                            WHERE k.kid = s.id),
                           'new')""")
    // source-only row id=100 is blessed -> inserts with amount 200.0
    assert(state("mins") === (0L until 10L).map(i => (i, Some(i * 10.0)))
      :+ (100L, Some(200.0)))
  }

  test("NOT MATCHED BY SOURCE AND EXISTS (correlated on target) THEN DELETE") {
    fixtures("mnmbs")
    spark.sql("""MERGE INTO corrm.db.mnmbs t USING mnmbs_src s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE AND
                      EXISTS (SELECT 1 FROM mnmbs_keep k WHERE k.kid = t.id)
                   THEN DELETE""")
    // no target row is {2,5,8}-matched AND keep-blessed except 2,8 (matched,
    // so NMBS never fires on them); no source-unmatched target id is in
    // keep {2,8,100} -> nothing deletes... construct: keep blesses 3 too
    assert(state("mnmbs") === (0L until 10L).map(i => (i, Some(i * 10.0))))
    spark.sql("""SELECT * FROM (VALUES (CAST(3 AS BIGINT)), (8)) k(kid)""")
      .createOrReplaceTempView("mnmbs_keep")
    spark.sql("""MERGE INTO corrm.db.mnmbs t USING mnmbs_src s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE AND
                      EXISTS (SELECT 1 FROM mnmbs_keep k WHERE k.kid = t.id)
                   THEN DELETE""")
    // id 3 is source-unmatched AND blessed -> deleted; 8 is matched -> kept
    assert(state("mnmbs") ===
      (0L until 10L).filterNot(_ == 3L).map(i => (i, Some(i * 10.0))))
  }

  test("name capture: inner relation shares column names with BOTH merge sides") {
    val t = fixtures("mself")
    // inner scan is the TARGET TABLE itself (same column names as t AND
    // carrying an `id` like s): delete matched rows whose id+1 also
    // exists in the table — a name-based re-bind would capture t2.id
    spark.sql("""MERGE INTO corrm.db.mself t USING mself_src s ON t.id = s.id
                 WHEN MATCHED AND EXISTS (SELECT 1 FROM corrm.db.mself t2
                                          WHERE t2.id = t.id + 1)
                   THEN DELETE""")
    // matched {2,5,8}: ids 2,5,8 all have successors (3,6,9) -> all delete
    assert(state("mself").map(_._1) === (0L until 10L).filterNot(i =>
      i == 2L || i == 5L || i == 8L))
    assert(t.meta.currentSnapshot.get.operation === "merge")
  }

  test("still refused: subquery in an ON key; non-scalar correlated in a value") {
    fixtures("mref")
    val onKey = intercept[Exception] {
      // the conditional clause routes through the general rewrite, where
      // the ON-key subquery policy is enforced
      spark.sql("""MERGE INTO corrm.db.mref t USING mref_src s
                   ON t.id = (SELECT max(k.kid) FROM mref_keep k)
                   WHEN MATCHED AND s.amount > 0 THEN DELETE""")
    }
    assert(onKey.getMessage.contains("subquery in ON key") ||
      onKey.getMessage.contains("ON condition"), onKey.getMessage)
    val nonScalar = intercept[Exception] {
      spark.sql("""MERGE INTO corrm.db.mref t USING mref_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET amount =
                     CASE WHEN EXISTS (SELECT 1 FROM mref_keep k
                                       WHERE k.kid = t.id)
                          THEN 1.0 ELSE 0.0 END""")
    }
    assert(nonScalar.getMessage.contains("only scalar subqueries"),
      nonScalar.getMessage)
  }
}
