package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** `ALTER COLUMN … TYPE` (Iceberg safe promotions: int→long, float→double,
  * decimal precision widen) as metadata-only commits: files written before
  * the promotion keep the narrower physical type; the read path scans each
  * era under its written type and upcasts, so old and new files union
  * losslessly — no rewrite. */
class TypePromotionSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", IntegerType),
    StructField("x", FloatType)))

  private def fresh(prefix: String): GraftTable = {
    val t = GraftTable.create(spark, tmpDir(prefix), s"t_$prefix", schema,
      partitionCols = Seq("k"))
    import spark.implicits._
    t.append(Seq(("a", 1, 1.5f), ("b", 2, 2.5f)).toDF("k", "n", "x"))
    t
  }

  test("int→long promotion unions eras; post-promotion values exceed Int range") {
    import spark.implicits._
    val t = fresh("i2l")
    t.updateColumnType("n", LongType)
    assert(t.schema("n").dataType === LongType)
    val big = 1L + Int.MaxValue
    t.append(Seq(("c", big, 3.5f)).toDF("k", "n", "x"))
    val got = t.toDF.select("k", "n").orderBy("n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 1L), ("b", 2L), ("c", big)))
    // filters and aggregates span both physical eras
    assert(t.toDF.filter(col("n") > 1L).count() === 2)
    assert(t.toDF.agg(sum("n")).head.getLong(0) === 3L + big)
  }

  test("float→double promotion preserves old-era values exactly") {
    import spark.implicits._
    val t = fresh("f2d")
    t.updateColumnType("x", DoubleType)
    t.append(Seq(("c", 3, 0.1)).toDF("k", "n", "x"))
    val got = t.toDF.select("x").orderBy("x").collect().map(_.getDouble(0))
    // old floats upcast via the float→double widening (exact)
    assert(got.toSeq === Seq(0.1, 1.5f.toDouble, 2.5f.toDouble))
  }

  test("promotion composes with a rename: era records follow the new name") {
    import spark.implicits._
    val t = fresh("ren")
    t.updateColumnType("n", LongType)
    t.renameColumn("n", "count")
    t.append(Seq(("c", 7L, 4.5f)).toDF("k", "count", "x"))
    assert(t.toDF.agg(sum("count")).head.getLong(0) === 10L)
    // and the other order: rename first, then promote under the new name
    val t2 = fresh("ren2")
    t2.renameColumn("n", "count")
    t2.updateColumnType("count", LongType)
    t2.append(Seq(("d", 9L, 5.5f)).toDF("k", "count", "x"))
    assert(t2.toDF.agg(sum("count")).head.getLong(0) === 12L)
  }

  test("unsafe changes and partition columns are rejected") {
    val t = fresh("guard")
    intercept[IllegalArgumentException](t.updateColumnType("n", IntegerType))
    intercept[IllegalArgumentException](t.updateColumnType("n", FloatType))
    intercept[IllegalArgumentException](t.updateColumnType("x", FloatType))
    intercept[IllegalArgumentException](t.updateColumnType("k", LongType))
    intercept[IllegalArgumentException](t.updateColumnType("nope", LongType))
    // decimal: only precision widening at fixed scale
    val loc = tmpDir("dec")
    val td = GraftTable.create(spark, loc, "t_dec", StructType(Seq(
      StructField("k", StringType),
      StructField("d", DecimalType(10, 2)))))
    import spark.implicits._
    td.append(Seq(("a", BigDecimal("1.25"))).toDF("k", "d"))
    intercept[IllegalArgumentException](
      td.updateColumnType("d", DecimalType(9, 2)))
    intercept[IllegalArgumentException](
      td.updateColumnType("d", DecimalType(12, 4)))
    td.updateColumnType("d", DecimalType(20, 2))
    td.append(Seq(("b", BigDecimal("123456789012345678.99")))
      .toDF("k", "d").select(col("k"), col("d").cast(DecimalType(20, 2)).as("d")))
    assert(td.toDF.agg(sum("d")).head.getDecimal(0).toPlainString
      === "123456789012345680.24")
  }

  test("time travel after a promotion presents the current (wide) schema") {
    import spark.implicits._
    val t = fresh("tt")
    val preId = t.meta.currentSnapshotId.get
    t.updateColumnType("n", LongType)
    t.append(Seq(("c", 5L, 3.5f)).toDF("k", "n", "x"))
    val pre = t.asOfSnapshot(preId)
    assert(pre.schema("n").dataType === LongType)
    assert(pre.agg(sum("n")).head.getLong(0) === 3L)
  }

  test("cherry-pick across a promotion era is rejected") {
    import spark.implicits._
    val t = fresh("cp")
    t.createOrReplaceBranch("stage")
    val staged = t.append(Seq(("s", 9, 9.5f)).toDF("k", "n", "x"),
      branch = Some("stage"))
    t.append(Seq(("d", 6, 6.5f)).toDF("k", "n", "x"))
    t.updateColumnType("n", LongType)
    val e = intercept[IllegalArgumentException](t.cherryPick(staged.id))
    assert(e.getMessage.contains("type-promoted"))
  }

  test("compaction migrates old-era files to the declared type") {
    import spark.implicits._
    val t = fresh("compact")
    t.updateColumnType("n", LongType)
    t.append(Seq(("c", 3L, 3.5f)).toDF("k", "n", "x"))
    t.rewriteDataFilesSorted(Seq(col("n")))
    // every live file now postdates the promotion: no stale-era file left
    val m = t.meta
    val lastChange = m.typeChanges.map(_.afterSeq).max
    assert(m.currentSnapshot.get.files.forall(_.dataSeq.exists(_ > lastChange)))
    assert(t.toDF.agg(sum("n")).head.getLong(0) === 6L)
  }

  test("changelog spans promotion eras under the current schema") {
    import spark.implicits._
    val t = fresh("cdc")
    val firstId = t.meta.currentSnapshotId.get
    t.updateColumnType("n", LongType)
    t.append(Seq(("c", 4L, 4.5f)).toDF("k", "n", "x"))
    val changes = t.changesBetween(firstId.toString, "main")
    assert(changes.schema("n").dataType === LongType)
    assert(changes.select("n").collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("append retry across a foreign type promotion rewrites its staged files") {
    import spark.implicits._
    val loc = tmpDir("prom-race")
    val t = GraftTable.create(spark, loc, "prom_race", schema)
    t.append(Seq(("a", 1, 1.0f)).toDF("k", "n", "x"))
    // inject a foreign promotion (simulating another JVM, invisible to the
    // per-table lock) between the append's file write and its CAS: the
    // staged INT32 files would otherwise commit with a post-promotion
    // dataSeq and become undecodable under the long era
    var injected = false
    GraftTable.onBeforeCommit = () => if (!injected) {
      injected = true
      GraftTable.load(spark, loc).updateColumnType("n", LongType)
    }
    try t.append(Seq(("b", 2, 2.0f)).toDF("k", "n", "x"))
    finally GraftTable.onBeforeCommit = () => ()
    assert(injected)
    val reloaded = GraftTable.load(spark, loc)
    assert(reloaded.schema("n").dataType === LongType)
    // decoding both eras proves the raced append's files were rewritten
    // long (without the rewrite this read throws on INT32 pages)
    assert(reloaded.toDF.agg(sum("n")).head.getLong(0) === 3L)
    assert(reloaded.toDF.count() === 2L)
  }

  test("SQL ALTER COLUMN TYPE routes through the catalog; SQL reads span eras") {
    val wh = tmpDir("prom-cat")
    spark.conf.set("spark.sql.catalog.promcat",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.promcat.warehouse", wh)
    spark.sql("CREATE TABLE promcat.ns.t (k STRING, n INT) USING parquet")
    try {
      spark.sql("INSERT INTO promcat.ns.t VALUES ('a', 1), ('b', 2)")
      spark.sql("ALTER TABLE promcat.ns.t ALTER COLUMN n TYPE bigint")
      assert(spark.table("promcat.ns.t").schema("n").dataType === LongType)
      spark.sql(s"INSERT INTO promcat.ns.t VALUES ('c', ${1L + Int.MaxValue})")
      // the SQL read takes the graft plan-read path (pre-promotion files
      // cannot be served by a plain declared-schema parquet scan)
      assert(spark.sql("SELECT sum(n) FROM promcat.ns.t").head.getLong(0)
        === 3L + Int.MaxValue + 1L)
      // narrowing is rejected end to end
      intercept[Exception](
        spark.sql("ALTER TABLE promcat.ns.t ALTER COLUMN n TYPE int"))
    } finally spark.sql("DROP TABLE promcat.ns.t")
  }
}
