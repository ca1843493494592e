package graft.apps

import org.apache.spark.sql.SparkSession

import graft.table.catalog.GraftSparkCatalog

/**
 * Reference-fidelity demo #3: the SAME daily-ingestion pipeline as
 * [[ActivityPipeline]], but every operation is the reference's literal SQL
 * statement shape (reference IcebergLoadActivityTask.scala runs the whole
 * task through `spark.sql`) — DDL with TBLPROPERTIES, CTAS staging,
 * MERGE INTO, branch DDL, metadata-table SELECTs, VERSION AS OF reads and
 * CALL maintenance procedures. A user porting the reference's SQL scripts
 * changes the catalog name and nothing else.
 *
 * Requires `spark.sql.extensions=graft.GraftSparkExtensions` on the
 * session (for MERGE INTO + branch DDL) and a configured graft catalog.
 *
 * Run: sbt "runMain graft.apps.ActivitySqlPipeline [warehouseDir]"
 */
object ActivitySqlPipeline {

  /** Runs the SQL pipeline against catalog `cat`; returns the fully
    * qualified table name for follow-up queries. `provider` is the USING
    * clause: through a NAMED graft catalog every table is versioned
    * regardless (`parquet` matches the reference's file-format property),
    * but through the `spark_catalog` session override
    * ([[graft.table.catalog.GraftSessionCatalog]]) the provider is the
    * router — pass `graft` there, exactly as the reference writes
    * `USING iceberg` under its session catalog. */
  def run(spark: SparkSession, cat: String, provider: String = "parquet"): String = {
    val t = s"$cat.finance.activity_sql"
    val tmp = s"$cat.finance.activity_sql_tmp"

    spark.sql(s"DROP TABLE IF EXISTS $t")
    // reference :17-40 — partitioned DDL + table properties
    spark.sql(
      s"""CREATE TABLE $t (
            account STRING, txn_date DATE, txn_id STRING, merchant STRING,
            amount DOUBLE, category STRING, last_updated TIMESTAMP)
          USING $provider PARTITIONED BY (txn_date)
          TBLPROPERTIES (
            'write.wap.enabled' = 'true',
            'write.delete.mode' = 'copy-on-write',
            'write.update.mode' = 'merge-on-read',
            'write.merge.mode' = 'merge-on-read',
            'write.delete.format.default' = 'avro',
            'write.parquet.compression-codec' = 'zstd',
            'comment' = 'Transaction Table')""")

    val days = Seq(
      "day1" -> ActivityData.day1(spark), "day2" -> ActivityData.day2(spark),
      "day3" -> ActivityData.day3(spark), "day4" -> ActivityData.day4(spark),
      "day5" -> ActivityData.day5(spark))
    days.foreach { case (branch, df) =>
      // reference :45-49 — schema-cloned staging table, the verbatim
      // CREATE OR REPLACE TABLE … AS SELECT … LIMIT 0 statement
      spark.sql(s"CREATE OR REPLACE TABLE $tmp USING $provider AS SELECT * FROM $t LIMIT 0")
      df.createOrReplaceTempView("activity_batch")
      // explicit column list: the SQL surface lists the partition column
      // last (Hive convention), so a positional SELECT * would misalign
      spark.sql(
        s"""INSERT INTO $tmp (account, txn_date, txn_id, merchant, amount, category, last_updated)
            SELECT account, txn_date, txn_id, merchant, amount, category, last_updated
            FROM activity_batch""")
      // reference :68-76 — the MERGE upsert, verbatim statement shape
      spark.sql(
        s"""MERGE INTO $t as target
            USING $tmp as src
            ON target.txn_id = src.txn_id
            WHEN MATCHED THEN
             UPDATE SET target.amount = src.amount, target.category = src.category, target.last_updated = src.last_updated, target.txn_date = src.txn_date
            WHEN NOT MATCHED THEN
             INSERT *""")
      // reference :78-80 — branch pin
      spark.sql(s"ALTER TABLE $t CREATE OR REPLACE BRANCH `$branch`")
      spark.sql(s"DROP TABLE $tmp")
    }

    // reference :84-97 — metadata tables through SQL
    printf("Activity History %d \n", spark.sql(s"SELECT * FROM $t.history").count())
    printf("Metadata Log Entries %d\n", spark.sql(s"SELECT * FROM $t.metadata_log_entries").count())
    printf("Snapshots %d\n", spark.sql(s"SELECT * FROM $t.snapshots").count())
    printf("Manifests %d\n", spark.sql(s"SELECT * FROM $t.manifests").count())
    printf("Data Files %d\n", spark.sql(s"SELECT * FROM $t.files").count())

    // reference :107-125 — current count, per-version counts, flagship agg
    printf("activity count %d\n", spark.sql(s"SELECT * FROM $t").count())
    days.map(_._1).foreach { b =>
      printf("as of %s: %d\n", b,
        spark.sql(s"SELECT * FROM $t VERSION AS OF '$b'").count())
    }
    spark.sql(
      s"""SELECT account, count(*) AS activity_count
          FROM $t GROUP BY account ORDER BY account""").show(10, truncate = false)

    // reference :128-137 — txn10 through time
    spark.sql(s"SELECT * FROM $t VERSION AS OF 'day1' WHERE txn_id = 'txn10'").show(false)
    spark.sql(s"SELECT * FROM $t WHERE txn_id = 'txn10'").show(false)

    // reference :156-165 — maintenance through CALL procedures
    spark.sql(s"CALL $cat.system.remove_orphan_files(table => 'finance.activity_sql', dry_run => true)").show(false)
    spark.sql(s"CALL $cat.system.rewrite_data_files(table => 'finance.activity_sql', strategy => 'sort', sort_order => 'account ASC NULLS LAST, txn_id DESC NULLS FIRST')").show(false)
    spark.sql(s"CALL $cat.system.rewrite_manifests('finance.activity_sql')").show(false)
    spark.sql(s"CALL $cat.system.expire_snapshots(table => 'finance.activity_sql', retain_last => 3)").show(false)
    // reference :167 — drop the oldest branch
    spark.sql(s"ALTER TABLE $t DROP BRANCH day1")
    t
  }

  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-activity-sql").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-activity-sql-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.sql.catalog.graftsql", classOf[GraftSparkCatalog].getName)
      .config("spark.sql.catalog.graftsql.warehouse", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = run(spark, "graftsql")
    printf("final count %d\n", spark.sql(s"SELECT * FROM $t").count())
    spark.stop()
  }
}
