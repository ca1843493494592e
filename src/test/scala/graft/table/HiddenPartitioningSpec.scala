package graft.table

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * Hidden partitioning (Iceberg partition transforms): days/months/years/
 * hours(ts), bucket(n, col), truncate(w, col). The source column stays in
 * the data file (hidden layout); predicates on the source column prune
 * whole files through the transform; the written layout is deterministic
 * (UTC temporal buckets, murmur3 buckets = functions.hash).
 */
class HiddenPartitioningSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ts", TimestampType), StructField("v", DoubleType)))

  private def rows(n: Int, dayOffset: Int = 0) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, s"name$i",
        Timestamp.from(java.time.Instant.parse("2024-03-01T00:00:00Z")
          .plus(java.time.Duration.ofHours((dayOffset * 24 + i % 72).toLong))),
        i * 1.5)
    }.toDF("id", "name", "ts", "v")
  }

  test("days(ts): source column stays in the file; dirs carry the UTC day") {
    val t = GraftTable.create(spark, tmpDir("hp-days"), "hp_days", schema,
      partitionCols = Seq("days(ts)"))
    t.append(rows(96))
    // layout on disk is ts_day=YYYY-MM-DD
    val dirs = t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.keys).toSet
    assert(dirs === Set("ts_day"))
    val days = t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.values).toSet
    assert(days === Set("2024-03-01", "2024-03-02", "2024-03-03"))
    // HIDDEN: reading back yields the full-fidelity ts from the data file,
    // not a day-truncated reconstruction
    val back = t.toDF.orderBy("id").collect()
    assert(back.length === 96)
    assert(back.map(_.getAs[Timestamp]("ts")).distinct.length === 72)
    // round-trip equality on every column
    assert(t.toDF.except(rows(96)).isEmpty && rows(96).except(t.toDF).isEmpty)
  }

  test("days(ts): timestamp range predicates prune files") {
    val t = GraftTable.create(spark, tmpDir("hp-days-prune"), "hp_days_p", schema,
      partitionCols = Seq("days(ts)"))
    t.append(rows(96)) // 3 day-partitions
    val cut = lit("2024-03-03 00:00:00").cast("timestamp")
    val pruned = t.scanWhere(col("ts") >= cut)
    assert(pruned.inputFiles.length < t.toDF.inputFiles.length)
    // correctness: pruned read == plain filter
    val expected = t.toDF.filter(col("ts") >= cut)
    assert(pruned.count() === expected.count() && pruned.count() > 0)
    // equality on a boundary timestamp keeps exactly the one day
    val eq = t.scanWhere(col("ts") === lit("2024-03-02 05:00:00").cast("timestamp"))
    assert(eq.inputFiles.length === 1)
  }

  test("days/hours on TIMESTAMP_NTZ: zone-free dirs, session TZ cannot leak, prune agrees") {
    import spark.implicits._
    val ntzSchema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampNTZType)))
    def ntzRows = (0 until 48).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 3, 1, 0, 0).plusHours(i.toLong))
    }.toDF("id", "ts")
    val t = GraftTable.create(spark, tmpDir("hp-ntz"), "hp_ntz", ntzSchema,
      partitionCols = Seq("days(ts)"))
    // write under a hostile session TZ: NTZ is wall-clock, the layout must
    // not shift by the zone offset
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati") // UTC+14
      t.append(ntzRows)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    val days = t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.values).toSet
    assert(days === Set("2024-03-01", "2024-03-02"))
    // prune-side literal maps through the same zone-free rendering
    val cut = lit("2024-03-02T00:00:00").cast("timestamp_ntz")
    val pruned = t.scanWhere(col("ts") >= cut)
    assert(pruned.inputFiles.length < t.toDF.inputFiles.length)
    assert(pruned.count() === 24)
    // hours transform: dir carries the wall-clock hour
    val h = GraftTable.create(spark, tmpDir("hp-ntz-h"), "hp_ntz_h", ntzSchema,
      partitionCols = Seq("hours(ts)"))
    h.append(ntzRows.limit(3).coalesce(1))
    val hourDirs = h.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.values).toSet
    assert(hourDirs === Set("2024-03-01-00", "2024-03-01-01", "2024-03-01-02"))
  }

  test("bucket(n, id): equality on the source reads one bucket") {
    val t = GraftTable.create(spark, tmpDir("hp-bucket"), "hp_bucket", schema,
      partitionCols = Seq("bucket(4,id)"))
    t.append(rows(64))
    val all = t.meta.currentSnapshot.get.files
    assert(all.flatMap(_.partitionValues.keys).toSet === Set("id_bucket_4"))
    assert(all.flatMap(_.partitionValues.values).map(_.toInt).toSet.subsetOf(Set(0, 1, 2, 3)))
    val one = t.scanWhere(col("id") === 7L)
    assert(one.inputFiles.length < t.toDF.inputFiles.length)
    assert(one.count() === 1 && one.collect().head.getAs[Long]("id") === 7L)
    // bucket value in the dir equals Spark's own hash of the literal
    import spark.implicits._
    val expectBucket = Seq(7L).toDF("id")
      .select(pmod(hash(col("id")), lit(4))).collect().head.getInt(0)
    val hit = all.find(_.path.contains(s"id_bucket_4=$expectBucket"))
    assert(hit.nonEmpty)
    // range predicates must NOT prune through a bucket (non-monotonic)
    assert(t.scanWhere(col("id") >= 0L).count() === 64)
  }

  test("truncate(w, string) prunes equality and ranges; ints floor") {
    val t = GraftTable.create(spark, tmpDir("hp-trunc"), "hp_trunc", schema,
      partitionCols = Seq("truncate(5,name)"))
    t.append(rows(30)) // name0..name29 -> prefixes name0..name9, then name1/name2 share name1x? no: substring(1,5) of "name12" is "name1"
    val dirs = t.meta.currentSnapshot.get.files.flatMap(_.partitionValues.values).toSet
    assert(dirs.forall(_.length <= 5))
    val eq = t.scanWhere(col("name") === "name7")
    assert(eq.count() === 1)
    assert(eq.inputFiles.length < t.toDF.inputFiles.length)
    val rng = t.scanWhere(col("name") >= "name8")
    assert(rng.count() === t.toDF.filter(col("name") >= "name8").count())

    val ti = GraftTable.create(spark, tmpDir("hp-trunc-int"), "hp_trunc_i", schema,
      partitionCols = Seq("truncate(10,id)"))
    ti.append(rows(40))
    val idirs = ti.meta.currentSnapshot.get.files.flatMap(_.partitionValues.values)
      .map(_.toLong).toSet
    assert(idirs === Set(0L, 10L, 20L, 30L))
    val ieq = ti.scanWhere(col("id") === 25L)
    assert(ieq.count() === 1 && ieq.inputFiles.length < ti.toDF.inputFiles.length)
    val irng = ti.scanWhere(col("id") >= 30L)
    assert(irng.inputFiles.length < ti.toDF.inputFiles.length &&
      irng.count() === 10)
  }

  test("months/years/hours transforms write the expected dirs") {
    val t = GraftTable.create(spark, tmpDir("hp-tempo"), "hp_tempo", schema,
      partitionCols = Seq("months(ts)"))
    t.append(rows(96))
    assert(t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.toSeq).toSet === Set("ts_month" -> "2024-03"))
    val h = GraftTable.create(spark, tmpDir("hp-hours"), "hp_hours", schema,
      partitionCols = Seq("hours(ts)"))
    h.append(rows(6))
    assert(h.meta.currentSnapshot.get.files.flatMap(_.partitionValues.values).toSet
      === (0 until 6).map(i => f"2024-03-01-$i%02d").toSet)
  }

  test("mixed spec: days(ts) + bucket(id) prunes on both dimensions") {
    val t = GraftTable.create(spark, tmpDir("hp-mixed"), "hp_mixed", schema,
      partitionCols = Seq("days(ts)", "bucket(4,id)"))
    t.append(rows(96))
    val total = t.toDF.inputFiles.length
    val both = t.scanWhere(col("ts") >= lit("2024-03-03 00:00:00").cast("timestamp")
      && col("id") === 50L)
    assert(both.inputFiles.length <= total / 4)
    assert(both.count() === t.toDF
      .filter(col("ts") >= lit("2024-03-03 00:00:00").cast("timestamp")
        && col("id") === 50L).count())
  }

  test("nulls land in the default dir; IsNull/IsNotNull prune through transforms") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("hp-null"), "hp_null", schema,
      partitionCols = Seq("days(ts)"))
    t.append(rows(24))
    t.append(Seq((1000L, "n", null.asInstanceOf[Timestamp], 0.0))
      .toDF("id", "name", "ts", "v"))
    assert(t.toDF.filter(col("ts").isNull).count() === 1)
    val nulls = t.scanWhere(col("ts").isNull)
    assert(nulls.inputFiles.length === 1 && nulls.count() === 1)
    val notNulls = t.scanWhere(col("ts").isNotNull)
    assert(notNulls.count() === 24 &&
      notNulls.inputFiles.length === t.toDF.inputFiles.length - 1)
  }

  test("bucket(n, col): NULL source rows land in the null dir and IsNull/IsNotNull prune soundly") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("hp-bnull"), "hp_bnull", schema,
      partitionCols = Seq("bucket(4, id)"))
    t.append(rows(16))
    t.append(Seq((null.asInstanceOf[java.lang.Long], "n",
        Timestamp.from(java.time.Instant.parse("2024-03-01T00:00:00Z")), 0.0))
      .toDF("id", "name", "ts", "v"))
    // murmur3(null) = the seed (42) — without the write-side null guard
    // the null row would file under pmod(42,4)=2 while IsNull pruning
    // looks only at the null dir, silently losing the row
    val nullDirs = t.meta.currentSnapshot.get.files
      .filter(_.partitionValues.values.exists(_ == "__HIVE_DEFAULT_PARTITION__"))
    assert(nullDirs.size === 1, "null row must land in the default dir")
    val nulls = t.scanWhere(col("id").isNull)
    assert(nulls.count() === 1)
    assert(nulls.inputFiles.length === 1)
    val notNulls = t.scanWhere(col("id").isNotNull)
    assert(notNulls.count() === 16)
    assert(notNulls.inputFiles.length === t.toDF.inputFiles.length - 1)
    // equality pruning through the bucket still works alongside nulls
    val eq = t.scanWhere(col("id") === 3L)
    assert(eq.count() === 1)
  }

  test("truncate(w, int) write/prune agree at Int.MinValue (Long-domain floor)") {
    import spark.implicits._
    val intSchema = StructType(Seq(
      StructField("k", IntegerType), StructField("v", DoubleType)))
    val t = GraftTable.create(spark, tmpDir("hp-tmin"), "hp_tmin", intSchema,
      partitionCols = Seq("truncate(10, k)"))
    t.append(Seq((Int.MinValue, 1.0), (7, 2.0)).toDF("k", "v"))
    // 32-bit src - pmod(src, w) wraps at Int.MinValue; the floor must be
    // computed in Long on BOTH sides or this file mis-prunes
    val hit = t.scanWhere(col("k") === Int.MinValue)
    assert(hit.count() === 1)
    val other = t.scanWhere(col("k") === 7)
    assert(other.count() === 1 && other.inputFiles.length === 1)
  }

  test("SQL DDL: PARTITIONED BY (days(ts), bucket(4, id)) via the catalog") {
    val wh = tmpDir("hp-sql-wh")
    spark.conf.set("spark.sql.catalog.hpcat",
      classOf[graft.table.catalog.GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.hpcat.warehouse", wh)
    try {
      spark.sql("CREATE TABLE hpcat.db.ev (id BIGINT, name STRING, " +
        "ts TIMESTAMP, v DOUBLE) USING graft " +
        "PARTITIONED BY (days(ts), bucket(4, id))")
      rows(48).createOrReplaceTempView("__hp_src")
      spark.sql("INSERT INTO hpcat.db.ev SELECT * FROM __hp_src")
      val t = GraftTable.load(spark, s"$wh/db/ev")
      assert(t.partitionCols === Seq("days(ts)", "bucket(4,id)"))
      assert(t.meta.currentSnapshot.get.files
        .flatMap(_.partitionValues.keys).toSet === Set("ts_day", "id_bucket_4"))
      // unfiltered SQL read round-trips all columns including full-precision ts
      val n = spark.sql("SELECT count(*) AS n, count(DISTINCT ts) AS d " +
        "FROM hpcat.db.ev").collect().head
      assert(n.getLong(0) === 48 && n.getLong(1) === 48)
      // DESCRIBE surfaces the transforms
      val parts = spark.sql("DESCRIBE TABLE EXTENDED hpcat.db.ev")
        .collect().map(_.mkString(" ")).mkString("\n")
      assert(parts.contains("days(ts)") && parts.toLowerCase.contains("bucket"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS hpcat.db.ev")
      spark.catalog.dropTempView("__hp_src")
      spark.conf.unset("spark.sql.catalog.hpcat")
      spark.conf.unset("spark.sql.catalog.hpcat.warehouse")
    }
  }

  test("spec evolution identity -> days(ts): per-file pruning, re-bucketing never aliases") {
    val t = GraftTable.create(spark, tmpDir("hp-evo"), "hp_evo", schema,
      partitionCols = Seq("bucket(4,id)"))
    t.append(rows(32))
    t.updatePartitionSpec(Seq("bucket(8,id)"))
    t.append(rows(32).withColumn("id", col("id") + 100))
    // old files carry id_bucket_4 dirs, new ones id_bucket_8 — the current
    // spec's prune must not misread mod-4 dirs as mod-8 values
    val layouts = t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.keys).toSet
    assert(layouts === Set("id_bucket_4", "id_bucket_8"))
    // every row still findable (old files unpruned under the new spec)
    (0 until 32).foreach { i =>
      assert(t.scanWhere(col("id") === i.toLong).count() === 1)
    }
    assert(t.scanWhere(col("id") === 107L).count() === 1)
    // compaction migrates everything into the current spec
    t.rewriteDataFilesSorted(Seq(col("id")))
    assert(t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.keys).toSet === Set("id_bucket_8"))
    assert(t.toDF.count() === 64)
  }

  test("CoW delete/update/merge preserve the transform layout") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("hp-cow"), "hp_cow", schema,
      partitionCols = Seq("days(ts)", "bucket(4,id)"))
    t.append(rows(96))
    // CoW delete rewrites only matched files, into the same layout
    t.deleteWhere(col("id") < 10L)
    assert(t.toDF.count() === 86)
    assert(t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.keys).toSet === Set("ts_day", "id_bucket_4"))
    // update rewrites keep the layout and the hidden ts fidelity
    t.updateWhere(col("id") === 50L, Seq("v" -> lit(999.9)))
    val r = t.toDF.filter(col("id") === 50L).collect().head
    assert(r.getAs[Double]("v") === 999.9)
    assert(t.toDF.select(countDistinct(col("ts"))).collect().head.getLong(0) >= 70)
    // merge-upsert: update one row, insert a new one; layout still intact
    val src = Seq(
      (50L, "name50", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-02T10:00:00Z")), 1.0),
      (2000L, "new", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-09T00:30:00Z")), 2.0))
      .toDF("id", "name", "ts", "v")
    t.merge(src, Seq("id"))
    assert(t.toDF.count() === 87)
    val dirs = t.meta.currentSnapshot.get.files.flatMap(_.partitionValues.toSeq)
    assert(dirs.exists { case (k, v) => k == "ts_day" && v == "2024-03-09" })
    // pruning still sound after the rewrites
    val pruned = t.scanWhere(col("ts") >= lit("2024-03-09 00:00:00").cast("timestamp"))
    assert(pruned.count() === 1 && pruned.inputFiles.length === 1)
  }

  test("bad specs are rejected at create time") {
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("hp-bad1"), "b1", schema,
        partitionCols = Seq("days(name)")) // not temporal
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("hp-bad2"), "b2", schema,
        partitionCols = Seq("bucket(0,id)"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("hp-bad3"), "b3", schema,
        partitionCols = Seq("truncate(3,v)")) // double
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("hp-bad4"), "b4", schema,
        partitionCols = Seq("wibble(id)"))
    }
    // hours() on a DATE column: Iceberg rejects it too — accepting it
    // would create/write fine and then crash every pruned scan at
    // applyToLiteral time (LocalDate has no HH field)
    val dateSchema = StructType(Seq(
      StructField("id", LongType), StructField("d", DateType)))
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("hp-bad5"), "b5", dateSchema,
        partitionCols = Seq("hours(d)"))
    }
    // days(date) stays legal
    GraftTable.create(spark, tmpDir("hp-ok-days"), "bok", dateSchema,
      partitionCols = Seq("days(d)"))
  }
}
