package graft.apps

import org.apache.spark.sql.SparkSession

import graft.table.{JdbcCommitGuard, RestCommitGuard}
import graft.table.catalog.{GraftSessionCatalog, GraftSparkCatalog}

/**
 * Session bootstrap mirroring the reference's `IcebergSupport`
 * (IcebergSupport.scala:1-38): environment variables pick the warehouse
 * and the catalog-service mode, and the builder wires BOTH a named
 * `graft` catalog and the `spark_catalog` session override — so
 * unqualified names resolve versioned tables, exactly the reference's
 * default-catalog setup.
 *
 *  - `GRAFT_CATALOG_WAREHOUSE` — warehouse dir (default `./tmp/warehouse`)
 *  - `GRAFT_CATALOG_URL` — commit-CAS service selection, the analog of the
 *    reference's `CATALOG_URL` REST-vs-JDBC switch:
 *    `http…` routes commits through [[graft.table.RestCommitGuard]];
 *    `jdbc:…` through [[graft.table.JdbcCommitGuard]]; unset keeps the
 *    storage-level filesystem CAS (local FS hard-link / HDFS rename).
 *
 * The graft table stack needs no catalog service for METADATA (the
 * snapshot log lives with the table), so unlike Iceberg the service
 * choice here only swaps the commit-claim primitive — readers and
 * writers are identical in all three modes.
 */
trait GraftSupport {

  private val warehouseLocation =
    Option(System.getenv("GRAFT_CATALOG_WAREHOUSE")).getOrElse("./tmp/warehouse")

  /** Installs the env-selected commit guard; returns the mode picked. */
  val catalogMode: String =
    GraftSupport.installGuardFor(Option(System.getenv("GRAFT_CATALOG_URL")))

  val sparkCatalogBuilder: SparkSession.Builder =
    GraftSupport.catalogBuilder(SparkSession.builder()
      .appName("graft-spark-session")
      .master("local[2]"), warehouseLocation)
}

object GraftSupport {

  /** The catalog wiring alone (reference IcebergSupport.scala:17-23):
    * named `graft` catalog + `spark_catalog` session override, one
    * warehouse. */
  def catalogBuilder(b: SparkSession.Builder, warehouse: String): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.catalog.graft", classOf[GraftSparkCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.sql.catalog.spark_catalog", classOf[GraftSessionCatalog].getName)
      .config("spark.sql.catalog.spark_catalog.warehouse", warehouse)

  /** Commit-CAS selection by url shape (reference IcebergSupport.scala:25-36
    * picks rest/jdbc the same way); returns the mode installed. */
  def installGuardFor(url: Option[String]): String = url match {
    case Some(u) if u.startsWith("http") =>
      RestCommitGuard.installGlobally(u); "rest"
    case Some(u) if u.startsWith("jdbc:") =>
      JdbcCommitGuard.installGlobally(u); "jdbc"
    case _ => "filesystem"
  }
}
