package graft.apps

import graft.SparkTestBase
import graft.table.{GraftTable, SnapshotLog}

/** Env-shaped bootstrap parity with the reference's IcebergSupport:
  * url-shape guard selection and the dual catalog wiring. */
class GraftSupportSpec extends SparkTestBase {

  test("guard selection by url shape: http -> rest, jdbc: -> jdbc, none -> filesystem") {
    val restore = SnapshotLog.commitGuardFor
    try {
      assert(GraftSupport.installGuardFor(None) === "filesystem")
      assert(GraftSupport.installGuardFor(
        Some(s"jdbc:derby:${tmpDir("gsup-derby")}/db;create=true")) === "jdbc")
      // the installed JDBC guard really carries commits
      import spark.implicits._
      val t = GraftTable.create(spark, tmpDir("gsup-t"), "gs",
        Seq((1L, "a")).toDF("id", "v").schema)
      t.append(Seq((1L, "a")).toDF("id", "v"))
      assert(t.toDF.count() === 1)
      val srv = new graft.table.RestCatalogServer
      val url = srv.start()
      try assert(GraftSupport.installGuardFor(Some(url)) === "rest")
      finally srv.stop()
    } finally SnapshotLog.commitGuardFor = restore
  }

  test("catalogBuilder wires the named catalog AND the spark_catalog override") {
    val wh = java.nio.file.Files.createTempDirectory("gsup-wh").toString
    val s2 = spark.newSession()
    // apply the same configs the builder would set, onto a child session
    GraftSupport.catalogBuilder(org.apache.spark.sql.SparkSession.builder(), wh)
    s2.conf.set("spark.sql.catalog.graft",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.conf.set("spark.sql.catalog.spark_catalog",
      classOf[graft.table.catalog.GraftSessionCatalog].getName)
    s2.conf.set("spark.sql.catalog.spark_catalog.warehouse", wh)
    s2.sql("CREATE TABLE finance.gsup (id BIGINT) USING graft")
    s2.sql("INSERT INTO finance.gsup VALUES (1), (2)")
    // one table, visible through BOTH catalog names
    assert(s2.sql("SELECT * FROM finance.gsup").count() === 2)
    assert(s2.sql("SELECT * FROM graft.finance.gsup").count() === 2)
  }
}
