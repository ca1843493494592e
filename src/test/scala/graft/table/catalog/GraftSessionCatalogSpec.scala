package graft.table.catalog

import graft.SparkTestBase
import graft.apps.ActivitySqlPipeline

/**
 * `spark_catalog` session-catalog override (reference
 * IcebergSupport.scala:22-23): UNQUALIFIED names resolve graft tables,
 * non-graft providers fall through to the built-in session catalog, and
 * the entire golden SQL pipeline (MERGE INTO, branch DDL, VERSION AS OF,
 * metadata tables, CALL procedures) runs with `spark_catalog` as the
 * catalog. Uses a child session so the override never leaks into the
 * shared test session.
 */
class GraftSessionCatalogSpec extends SparkTestBase {

  private lazy val s2 = {
    val wh = java.nio.file.Files.createTempDirectory("session-cat-wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.spark_catalog",
      classOf[GraftSessionCatalog].getName)
    s.conf.set("spark.sql.catalog.spark_catalog.warehouse", wh)
    s
  }

  test("unqualified names: USING graft creates a versioned table; branch DDL + time travel work") {
    s2.sql("CREATE TABLE finance.sc_demo (id BIGINT, v STRING) USING graft")
    s2.sql("INSERT INTO finance.sc_demo VALUES (1, 'a'), (2, 'b')")
    s2.sql("ALTER TABLE finance.sc_demo CREATE BRANCH two_rows")
    s2.sql("INSERT INTO finance.sc_demo VALUES (3, 'c')")
    assert(s2.sql("SELECT * FROM finance.sc_demo").count() === 3)
    // the versioned surface, all through unqualified session-catalog names
    assert(s2.sql("SELECT * FROM finance.sc_demo VERSION AS OF 'two_rows'").count() === 2)
    // two append commits (CREATE is a metadata-only v1, no snapshot)
    assert(s2.sql("SELECT * FROM finance.sc_demo.history").count() === 2)
    assert(s2.sql("SELECT * FROM finance.sc_demo.snapshots").count() === 2)
    // and fully qualified spark_catalog.* names resolve the same table
    assert(s2.sql("SELECT * FROM spark_catalog.finance.sc_demo").count() === 3)
  }

  test("non-graft providers fall through to the delegate session catalog") {
    s2.sql("CREATE TABLE sc_plain (a INT) USING parquet")
    try {
      s2.sql("INSERT INTO sc_plain VALUES (7), (8)")
      assert(s2.sql("SELECT * FROM sc_plain").count() === 2)
      // a plain table has no graft metadata surface
      intercept[Exception](s2.sql("SELECT * FROM sc_plain.snapshots").collect())
    } finally s2.sql("DROP TABLE IF EXISTS sc_plain")
    assert(!s2.catalog.tableExists("sc_plain"))
  }

  test("the SPJ bucket function claims only root/system namespaces; user namespaces delegate") {
    import org.apache.spark.sql.connector.catalog.Identifier
    // shared claim predicate used by BOTH catalogs' loadFunction/
    // functionExists: root and system serve graft's bucket, any other
    // namespace falls through (so a user's own ns.bucket is never
    // shadowed and functionExists never lies about arbitrary namespaces)
    val wh = java.nio.file.Files.createTempDirectory("fncat-wh").toString
    val cat = new GraftSparkCatalog
    cat.initialize("fncat", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    assert(cat.loadFunction(Identifier.of(Array.empty, "bucket")) ne null)
    assert(cat.loadFunction(Identifier.of(Array("system"), "bucket")) ne null)
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException](
      cat.loadFunction(Identifier.of(Array("some_ns"), "bucket")))
  }

  test("the golden SQL pipeline runs verbatim with spark_catalog as the catalog") {
    val tn = ActivitySqlPipeline.run(s2, "spark_catalog", provider = "graft")
    assert(tn === "spark_catalog.finance.activity_sql")
    assert(s2.sql(s"SELECT * FROM $tn").count() === 50)
    assert(s2.sql("SELECT * FROM finance.activity_sql VERSION AS OF 'day2'").count() === 30)
    assert(s2.sql("SELECT category FROM finance.activity_sql WHERE txn_id = 'txn10'")
      .collect().head.getString(0) === "Fashion")
    val refs = s2.sql(s"SELECT name FROM $tn.refs").collect().map(_.getString(0)).toSet
    assert(refs === Set("main", "day2", "day3", "day4", "day5"))
  }
}
