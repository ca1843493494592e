package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.apps.ActivityData
/** One-off generator: write the synthesized activity day-batches as CSV
  * day-folder fixtures (header + ISO timestamps), mirroring the reference's
  * input layout for the S1 CSV-ingestion path. */
object GenCsvFixtures {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/input")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val days = Seq(
      "2024-03-02" -> ActivityData.day1(spark),
      "2024-03-03" -> ActivityData.day2(spark),
      "2024-03-05" -> ActivityData.day3(spark),
      "2024-03-08" -> ActivityData.day4(spark),
      "2024-03-09" -> ActivityData.day5(spark),
      "2024-03-10" -> ActivityData.badBatch(spark))
    days.foreach { case (day, df) =>
      val rows = df.collect()
      val header = df.columns.mkString(",")
      val body = rows.map(r => df.columns.indices.map { i =>
        val v = r.get(i)
        if (v == null) "" else v match {
          case t: java.sql.Timestamp => t.toInstant.toString // ISO-8601 Z
          case other => other.toString
        }
      }.mkString(",")).mkString("\n")
      val dir = Paths.get(out, day)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"$day.csv"), header + "\n" + body + "\n")
      println(s"wrote $dir (${rows.length} rows)")
    }
    spark.stop()
  }
}
