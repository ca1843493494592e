package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Avro physical format for merge-on-read delete files — the reference's
  * `write.delete.format.default = avro`
  * (IcebergLoadActivityTask.scala:34), formerly waived, now honored for
  * real with the raw Avro container API. */
class AvroDeleteSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType), StructField("ts", TimestampType)))

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 0.5,
      java.sql.Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 10:00:00")))
      .toDF("id", "grp", "v", "ts")
  }

  private def mkTable(name: String, avro: Boolean): GraftTable =
    GraftTable.create(spark, tmpDir(name), name, schema,
      props = if (avro) Map("write.delete.format.default" -> "avro")
        else Map.empty)

  test("equality MoR delete writes a REAL Avro container file; reads apply it") {
    val t = mkTable("avdel-eq", avro = true)
    t.append(rows(0 until 60))
    t.deleteWhereMoR(col("id") % 5 === 2, Seq("id"))
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.size === 1 && dels.head.path.endsWith(".avro"))
    assert(dels.head.records === 12L)
    // the file IS an Avro object container: magic bytes 'Obj\1'
    val p = new org.apache.hadoop.fs.Path(s"${t.dataDir}/${dels.head.path}")
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val magic = new Array[Byte](4)
    try in.readFully(magic) finally in.close()
    assert(magic.toSeq === Seq[Byte]('O', 'b', 'j', 1))
    assert(t.toDF.count() === 48)
    assert(t.toDF.filter(col("id") % 5 === 2).count() === 0)
  }

  test("avro mode equals parquet mode across delete/update/merge MoR + rewrite") {
    import spark.implicits._
    def drive(t: GraftTable): Seq[(Long, String, Double)] = {
      t.append(rows(0 until 50))
      t.deleteWhereMoR(col("id") < 5, Seq("id"))
      t.updateWhereMoR(col("id") === 40L, Seq("v" -> lit(9.9)), Seq("id"))
      t.deleteWherePositional(col("grp") === "g3")
      t.append(rows(100 until 110))
      t.rewritePositionDeleteFiles()
      t.toDF.select(col("id"), col("grp"), col("v"))
        .as[(Long, String, Double)].collect().toSeq.sorted
    }
    val a = drive(mkTable("avdel-a", avro = true))
    val p = drive(mkTable("avdel-p", avro = false))
    assert(a === p)
    assert(a.nonEmpty)
  }

  test("timestamp-typed equality keys round-trip through the Avro logical type") {
    val t = mkTable("avdel-ts", avro = true)
    t.append(rows(0 until 30))
    val cut = java.sql.Timestamp.valueOf("2024-01-03 10:00:00")
    t.deleteWhereMoR(col("ts") === cut, Seq("ts"))
    assert(t.toDF.filter(col("ts") === cut).count() === 0)
    assert(t.toDF.count() === 30 -
      rows(0 until 30).filter(col("ts") === cut).count())
  }

  test("changelog batch AND stream read avro delete files (round 15: refusal lifted)") {
    val t = mkTable("avdel-chg", avro = true)
    t.append(rows(0 until 20))
    t.createOrReplaceBranch("b0")
    t.deleteWhereMoR(col("id") >= 15, Seq("id"))
    t.createOrReplaceBranch("b1")
    val ch = t.changelogBetween("b0", "b1")
      .filter(col("_change_type") === "DELETE").count()
    assert(ch === 5L)
    // the stream now emits DELETE_KEY images straight off the avro
    // container (the reference's default delete format composes with CDC)
    spark.readStream.format("graft-stream").option("changelog", "true")
      .load(t.location)
      .writeStream.format("memory").queryName("avdel_chg_q")
      .option("checkpointLocation", tmpDir("avdel-chg-cp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val images = spark.table("avdel_chg_q")
    assert(images.filter(col("_change_type") === "DELETE_KEY").count() === 5L)
    assert(images.filter(col("_change_type") === "DELETE_KEY")
      .select("_change_key").distinct().collect().map(_.getString(0)).toSeq
      === Seq("id"))
    assert(images.filter(col("_change_type") === "INSERT").count() === 20L)
  }

  test("DV mode takes precedence: positional deletes stay run-length parquet") {
    val t = GraftTable.create(spark, tmpDir("avdel-dv"), "avdeldv", schema,
      props = Map("write.delete.format.default" -> "avro",
        "write.delete.vector.enabled" -> "true"))
    t.append(rows(0 until 20))
    t.deleteWherePositional(col("id") < 3)
    val d = t.meta.currentSnapshot.get.deleteFiles.head
    assert(d.isDv && d.path.endsWith(".parquet"),
      "deletion vectors have their own format; the avro property is for row lists")
    // but the same table's EQUALITY deletes honor avro
    t.deleteWhereMoR(col("id") >= 18, Seq("id"))
    val eq = t.meta.currentSnapshot.get.deleteFiles.filter(_.kind == "equality")
    assert(eq.nonEmpty && eq.forall(_.path.endsWith(".avro")))
    assert(t.toDF.count() === 15)
  }
}
