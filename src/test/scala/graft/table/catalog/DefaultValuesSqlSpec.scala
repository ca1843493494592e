package graft.table.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.table.GraftTable

/**
 * The SQL surface of column DEFAULT values through the DSv2 catalog: the
 * catalog declares `SUPPORT_COLUMN_DEFAULT_VALUE`, so Spark's own DDL and
 * INSERT default-filling machinery drive `GraftTable.addColumn(…,
 * defaultSql)` / `setColumnDefault`, and reads of pre-add files route
 * through the graft era plan (a plain parquet scan would read NULL).
 */
class DefaultValuesSqlSpec extends SparkTestBase {

  private def freshCatalog(tag: String): String = {
    val wh = tmpDir(s"defsql-$tag")
    val cat = s"gdef$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  test("CREATE TABLE with DEFAULT: omitted and DEFAULT-keyword inserts fill") {
    val cat = freshCatalog("create")
    spark.sql(s"CREATE TABLE $cat.ns.t " +
      "(k STRING, qty INT DEFAULT 5, tag STRING DEFAULT 'x') USING parquet")
    try {
      spark.sql(s"INSERT INTO $cat.ns.t (k) VALUES ('a')")
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('b', DEFAULT, DEFAULT)")
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('c', 9, 'y')")
      val rows = spark.sql(s"SELECT k, qty, tag FROM $cat.ns.t ORDER BY k")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      assert(rows.toSeq === Seq(("a", 5, "x"), ("b", 5, "x"), ("c", 9, "y")))
    } finally spark.sql(s"DROP TABLE $cat.ns.t")
  }

  test("ALTER TABLE ADD COLUMN DEFAULT: old rows read it through plain SQL") {
    val cat = freshCatalog("add")
    spark.sql(s"CREATE TABLE $cat.ns.t (k STRING, amount DOUBLE) USING parquet")
    try {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('a', 1.0), ('b', 2.0)")
      spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN channel STRING DEFAULT 'WEB'")
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('c', 3.0, 'STORE')")
      // the pre-add files don't store the column: this read MUST go
      // through the graft era plan and project the frozen initial default
      val rows = spark.sql(s"SELECT k, channel FROM $cat.ns.t ORDER BY k")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.toSeq === Seq(("a", "WEB"), ("b", "WEB"), ("c", "STORE")))
      // filter on the defaulted value spans eras
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.ns.t WHERE channel = 'WEB'")
        .head.getLong(0) === 2L)
    } finally spark.sql(s"DROP TABLE $cat.ns.t")
  }

  test("SET DEFAULT changes future writes only; DROP DEFAULT reverts to NULL") {
    val cat = freshCatalog("set")
    spark.sql(s"CREATE TABLE $cat.ns.t (k STRING, amount DOUBLE) USING parquet")
    try {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('a', 1.0)")
      spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN channel STRING DEFAULT 'WEB'")
      spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN channel SET DEFAULT 'STORE'")
      spark.sql(s"INSERT INTO $cat.ns.t (k, amount) VALUES ('b', 2.0)")
      spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN channel DROP DEFAULT")
      spark.sql(s"INSERT INTO $cat.ns.t (k, amount) VALUES ('c', 3.0)")
      val rows = spark.sql(s"SELECT k, channel FROM $cat.ns.t ORDER BY k")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
      // initial default for the pre-add row is UNAFFECTED by SET/DROP
      assert(rows.toSeq === Seq(("a", Some("WEB")), ("b", Some("STORE")),
        ("c", None)))
    } finally spark.sql(s"DROP TABLE $cat.ns.t")
  }

  test("SET DEFAULT on a column added without one never rewrites history") {
    val cat = freshCatalog("late")
    spark.sql(s"CREATE TABLE $cat.ns.t (k STRING) USING parquet")
    try {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('a')")
      spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN note STRING")
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('b', 'n1')")
      spark.sql(s"ALTER TABLE $cat.ns.t ALTER COLUMN note SET DEFAULT 'later'")
      spark.sql(s"INSERT INTO $cat.ns.t (k) VALUES ('c')")
      val rows = spark.sql(s"SELECT k, note FROM $cat.ns.t ORDER BY k")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
      // 'a' predates the column and the column has NO initial default:
      // it keeps reading NULL — SET DEFAULT is not retroactive
      assert(rows.toSeq === Seq(("a", None), ("b", Some("n1")),
        ("c", Some("later"))))
    } finally spark.sql(s"DROP TABLE $cat.ns.t")
  }

  test("defaults survive DESCRIBE and partitioned tables; VERSION AS OF composes") {
    val cat = freshCatalog("part")
    spark.sql(s"CREATE TABLE $cat.ns.t (k STRING, amount DOUBLE) " +
      "USING parquet PARTITIONED BY (k)")
    try {
      // the SQL relation lists partition columns LAST — use explicit
      // column lists so VALUES align by name, not position
      spark.sql(s"INSERT INTO $cat.ns.t (k, amount) VALUES ('a', 1.0), ('b', 2.0)")
      spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN channel STRING DEFAULT 'WEB'")
      spark.sql(s"INSERT INTO $cat.ns.t (k, amount, channel) VALUES ('c', 3.0, 'STORE')")
      val loc = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[GraftSparkCatalog]
        .tableLocation(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ns"), "t"))
      val t = GraftTable.load(spark, loc)
      val v1 = t.meta.snapshots.map(_.id).min
      // DESCRIBE lists the current write-default
      val desc = spark.sql(s"DESCRIBE TABLE $cat.ns.t").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(desc.contains("channel"))
      // time travel to the pre-add snapshot presents the CURRENT schema
      val rows = spark.sql(
        s"SELECT k, channel FROM $cat.ns.t VERSION AS OF $v1 ORDER BY k")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.toSeq === Seq(("a", "WEB"), ("b", "WEB")))
    } finally spark.sql(s"DROP TABLE $cat.ns.t")
  }

  test("MERGE INSERT into a table with defaulted columns") {
    val cat = freshCatalog("merge")
    spark.sql(s"CREATE TABLE $cat.ns.t " +
      "(k STRING, amount DOUBLE, channel STRING DEFAULT 'WEB') USING parquet")
    try {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES ('a', 1.0, 'APP')")
      import spark.implicits._
      Seq(("a", 10.0), ("b", 20.0)).toDF("k", "amount")
        .createOrReplaceTempView("defaults_merge_src")
      spark.sql(
        s"""MERGE INTO $cat.ns.t t USING defaults_merge_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET t.amount = s.amount
            WHEN NOT MATCHED THEN INSERT (k, amount) VALUES (s.k, s.amount)""")
      val rows = spark.sql(s"SELECT k, amount, channel FROM $cat.ns.t ORDER BY k")
        .collect().map(r => (r.getString(0), r.getDouble(1),
          Option(r.getString(2))))
      // matched row keeps its stored channel; the partial INSERT fills the
      // write-default for the unlisted column
      assert(rows.toSeq === Seq(("a", 10.0, Some("APP")),
        ("b", 20.0, Some("WEB"))))
    } finally spark.sql(s"DROP TABLE $cat.ns.t")
  }
}
