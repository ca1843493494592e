package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** SQL views persisted in the graft catalog (Spark 4 ViewCatalog —
  * the Iceberg-REST-views capability): CREATE/REPLACE/ALTER/DROP/SHOW
  * VIEW as versioned metadata, reads expanding through Catalyst. */
class ViewCatalogSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))

  private lazy val cat: String = {
    val wh = tmpDir("viewcat-wh")
    spark.conf.set("spark.sql.catalog.vcat",
      "graft.table.catalog.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.vcat.warehouse", wh)
    import spark.implicits._
    val t = GraftTable.create(spark, s"$wh/ns/base", "vcat.ns.base", schema)
    t.append((1L to 40L).map(i => (s"p${i % 4}", i)).toDF("k", "n"))
    "vcat"
  }

  test("CREATE VIEW persists; SELECT expands; view tracks source appends") {
    import spark.implicits._
    spark.sql(s"CREATE VIEW $cat.ns.v_even AS " +
      s"SELECT k, count(*) AS c, sum(n) AS s FROM $cat.ns.base " +
      "WHERE n % 2 = 0 GROUP BY k")
    val got = spark.sql(s"SELECT * FROM $cat.ns.v_even ORDER BY k")
      .as[(String, Long, Long)].collect().toSeq
    val want = spark.sql(
      s"SELECT k, count(*) AS c, sum(n) AS s FROM $cat.ns.base " +
        "WHERE n % 2 = 0 GROUP BY k ORDER BY k")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === want && got.nonEmpty)
    // a view is SQL, not a snapshot: it sees subsequent source commits
    val t = GraftTable.load(spark,
      spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + "/ns/base")
    t.append(Seq(("p9", 100L)).toDF("k", "n"))
    assert(spark.sql(s"SELECT sum(c) FROM $cat.ns.v_even").head.getLong(0) ===
      21L, "the view must see the appended even row")
  }

  test("SHOW VIEWS lists; DROP VIEW removes; name clashes refused") {
    spark.sql(s"CREATE VIEW $cat.ns.v_tmp AS SELECT k FROM $cat.ns.base")
    val listed = spark.sql(s"SHOW VIEWS IN $cat.ns").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("v_tmp"))
    // a view name cannot shadow a table, nor a table a view
    intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.ns.base AS SELECT 1 AS one")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.ns.v_tmp (x INT)")
    }
    spark.sql(s"DROP VIEW $cat.ns.v_tmp")
    assert(!spark.sql(s"SHOW VIEWS IN $cat.ns").collect()
      .map(_.getString(1)).contains("v_tmp"))
  }

  test("CREATE OR REPLACE appends a version; the full log is retained on disk") {
    spark.sql(s"CREATE VIEW $cat.ns.v_ver AS SELECT k FROM $cat.ns.base")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.ns.v_ver AS " +
      s"SELECT k, n FROM $cat.ns.base WHERE n > 35")
    assert(spark.sql(s"SELECT * FROM $cat.ns.v_ver").columns.toSeq ===
      Seq("k", "n"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.v_ver").head.getLong(0) === 6L)
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val meta = graft.table.catalog.GraftViews.load(s"$wh/ns/v_ver",
      spark.sparkContext.hadoopConfiguration).get
    assert(meta.versions.map(_.version) === Seq(1, 2),
      "replace must append a version, not erase history")
    assert(meta.versions.head.sql.contains("SELECT k FROM"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES version the property map") {
    spark.sql(s"CREATE VIEW $cat.ns.v_props AS SELECT k FROM $cat.ns.base")
    spark.sql(s"ALTER VIEW $cat.ns.v_props SET TBLPROPERTIES ('team'='data')")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    def meta = graft.table.catalog.GraftViews.load(s"$wh/ns/v_props",
      spark.sparkContext.hadoopConfiguration).get
    assert(meta.current.properties.get("team") === Some("data"))
    spark.sql(s"ALTER VIEW $cat.ns.v_props UNSET TBLPROPERTIES ('team')")
    assert(meta.current.properties.get("team") === None)
    assert(meta.versions.size === 3)
  }

  test("a direct self-referencing REPLACE is refused at DDL time") {
    spark.sql(s"CREATE VIEW $cat.ns.v_self AS SELECT k FROM $cat.ns.base")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"CREATE OR REPLACE VIEW $cat.ns.v_self AS " +
        s"SELECT k FROM $cat.ns.v_self")
    }
    assert(e.getErrorClass == "RECURSIVE_VIEW" ||
      e.getMessage.toLowerCase.contains("recursive"))
    // the old version is untouched
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.v_self").head.getLong(0) === 41L)
  }

  test("view body resolves in its AUTHORING catalog/namespace, not the reader's") {
    cat
    val prevCat = spark.catalog.currentCatalog()
    val prevDb = spark.catalog.currentDatabase
    try {
      // author inside vcat.ns: an UNQUALIFIED base reference is legal and
      // must be pinned to the authoring context
      spark.sql(s"USE $cat.ns")
      spark.sql(s"CREATE VIEW $cat.ns.v_ctx AS SELECT k, n FROM base WHERE n <= 10")
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.v_ctx").head.getLong(0) === 10L)
      // reader in a DIFFERENT context — a session catalog holding its own
      // table named `base` with a different shape
      spark.sql(s"USE spark_catalog.default")
      spark.sql("CREATE TABLE IF NOT EXISTS base_decoy (x INT) USING parquet")
      assert(spark.sql(s"SELECT count(*) FROM $cat.ns.v_ctx").head.getLong(0) === 10L,
        "view must keep resolving `base` against vcat.ns from anywhere")
    } finally {
      spark.sql(s"USE $prevCat.$prevDb")
    }
  }

  test("a view referencing a temp view is refused at DDL time") {
    cat
    import spark.implicits._
    Seq((1, "t")).toDF("a", "b").createOrReplaceTempView("v_tmp_src")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"CREATE VIEW $cat.ns.v_over_tmp AS SELECT * FROM v_tmp_src")
    }
    assert(e.getMessage.toLowerCase.contains("temp"))
  }

  test("save() never loses the view: aside-file crash window recovers on read") {
    cat
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    spark.sql(s"CREATE VIEW $cat.ns.v_crash AS SELECT k FROM $cat.ns.base")
    val expected =
      spark.sql(s"SELECT count(*) FROM $cat.ns.v_crash").head.getLong(0)
    val slot = s"$wh/ns/v_crash"
    val fs = new org.apache.hadoop.fs.Path(slot).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(slot, "graft.view.json")
    // simulate a crash between the aside rename and the install rename:
    // the live file is gone, only the aside copy remains
    val aside = new org.apache.hadoop.fs.Path(slot, ".view-old-999-crash.json")
    assert(fs.rename(live, aside))
    assert(!fs.exists(live))
    // the next read recovers the aside copy transparently
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.v_crash").head.getLong(0)
      === expected)
    assert(fs.exists(live), "recovery must reinstall the live file")
    assert(!fs.exists(aside))
  }

  test("DROP VIEW removes aside debris: a dropped view must not resurrect") {
    cat
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    spark.sql(s"CREATE VIEW $cat.ns.v_zombie AS SELECT k FROM $cat.ns.base")
    val slot = s"$wh/ns/v_zombie"
    val fs = new org.apache.hadoop.fs.Path(slot).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(slot, "graft.view.json")
    // stale aside debris from an interrupted save sits next to the live
    // file; DROP must remove BOTH or recovery would resurrect the view
    val aside = new org.apache.hadoop.fs.Path(slot, ".view-old-111-stale.json")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, aside, false, conf)
    spark.sql(s"DROP VIEW $cat.ns.v_zombie")
    assert(!fs.exists(live) && !fs.exists(aside))
    val gone = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.ns.v_zombie").collect()
    }
    assert(gone.getMessage.contains("v_zombie"))
    // aside-only state (crash left no live file) still counts as existing:
    // DROP reports success once and removes the debris
    spark.sql(s"CREATE VIEW $cat.ns.v_zombie2 AS SELECT k FROM $cat.ns.base")
    val slot2 = s"$wh/ns/v_zombie2"
    val live2 = new org.apache.hadoop.fs.Path(slot2, "graft.view.json")
    val aside2 = new org.apache.hadoop.fs.Path(slot2, ".view-old-222-crash.json")
    assert(fs.rename(live2, aside2))
    spark.sql(s"DROP VIEW $cat.ns.v_zombie2")
    assert(!fs.exists(live2) && !fs.exists(aside2))
  }

  test("CTE names shadow lexically, not plan-globally, inside a view body") {
    cat
    val prevCat = spark.catalog.currentCatalog()
    val prevDb = spark.catalog.currentDatabase
    try {
      spark.sql(s"USE $cat.ns")
      // the OUTER `base` reference must qualify against the authoring
      // context even though an unrelated subquery binds a CTE named
      // `base` — a plan-global CTE collect would skip qualifying it and
      // leave it to resolve in the reader's session
      spark.sql(s"""CREATE VIEW $cat.ns.v_cte_scope AS
        SELECT count(*) AS c FROM base
        WHERE n <= (SELECT max(m) FROM (
          WITH base AS (SELECT 10 AS m) SELECT m FROM base))""")
      assert(spark.sql(s"SELECT c FROM $cat.ns.v_cte_scope").head.getLong(0) === 10L)
      spark.sql(s"USE spark_catalog.default")
      assert(spark.sql(s"SELECT c FROM $cat.ns.v_cte_scope").head.getLong(0) === 10L,
        "outer `base` must stay pinned to vcat.ns from any reader context")
    } finally spark.sql(s"USE $prevCat.$prevDb")
  }

  test("time travel composes through a view (VERSION AS OF on the base table)") {
    import spark.implicits._
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val t = GraftTable.create(spark, s"$wh/ns/tt", "vcat.ns.tt", schema)
    t.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"))
    t.createOrReplaceBranch("v1")
    t.append(Seq(("c", 3L)).toDF("k", "n"))
    // a view whose SQL pins VERSION AS OF resolves the branch at read time
    spark.sql(s"CREATE VIEW $cat.ns.v_pinned AS " +
      s"SELECT sum(n) AS s FROM $cat.ns.tt VERSION AS OF 'v1'")
    assert(spark.sql(s"SELECT s FROM $cat.ns.v_pinned").head.getLong(0) === 3L)
    // while an unpinned view over the same table sees the current head
    spark.sql(s"CREATE VIEW $cat.ns.v_head AS " +
      s"SELECT sum(n) AS s FROM $cat.ns.tt")
    assert(spark.sql(s"SELECT s FROM $cat.ns.v_head").head.getLong(0) === 6L)
  }
}
