package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class FileSkippingSpec extends SparkTestBase {

  // unpartitioned table, 4 appends with disjoint key ranges -> 4+ files whose
  // footer stats are the only way to skip
  private lazy val table: GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("skip"), "skip", StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("d", DateType), StructField("v", DoubleType))))
    for (b <- 0 until 4) {
      val df = ((b * 1000) until (b * 1000 + 100)).map(i =>
        (i.toLong, s"g$b", java.sql.Date.valueOf(s"2024-0${b + 1}-15"), i * 1.5))
        .toDF("id", "grp", "d", "v")
      t.append(df.coalesce(1))
    }
    t
  }

  test("commit captures per-file min/max stats") {
    val files = table.meta.currentSnapshot.get.files
    assert(files.size >= 4)
    val f0 = files.find(_.stats.exists(_.get("id").exists(_.min == "0"))).get
    val st = f0.stats.get
    assert(st("id").max === "99")
    assert(st("grp").min === "g0" && st("grp").max === "g0")
    assert(st("d").min === "2024-01-15") // date normalized to ISO
  }

  test("point equality prunes to a single file before the scan") {
    val df = table.scanWhere(col("id") === 1050L)
    assert(df.inputFiles.length === 1)
    assert(df.count() === 1)
    // unpruned baseline reads everything
    assert(table.toDF.filter(col("id") === 1050L).inputFiles.length >= 4)
  }

  test("range predicates prune by numeric order, not string order") {
    // id >= 3000 must keep ONLY batch 3 (string compare would also keep
    // e.g. min="0" files if compared lexically)
    val df = table.scanWhere(col("id") >= 3000L)
    assert(df.inputFiles.length === 1)
    assert(df.count() === 100)
  }

  test("string and date predicates prune lexically/chronologically") {
    assert(table.scanWhere(col("grp") === "g2").inputFiles.length === 1)
    val df = table.scanWhere(col("d") < lit("2024-02-01").cast("date"))
    assert(df.inputFiles.length === 1)
    assert(df.count() === 100)
  }

  test("conjunctions intersect pruning; contradictions read zero files") {
    val df = table.scanWhere(col("id") >= 1000L && col("id") < 2000L)
    assert(df.inputFiles.length === 1)
    val none = table.scanWhere(col("id") === 1050L && col("grp") === "g3")
    assert(none.inputFiles.isEmpty && none.count() === 0)
  }

  test("pruning is conservative: unsupported predicates keep all files, results stay correct") {
    val df = table.scanWhere(length(col("grp")) === 2) // not a stat-prunable shape
    assert(df.inputFiles.length >= 4)
    assert(df.count() === 400)
    // correctness equivalence with plain filter
    assert(table.scanWhere(col("v") > 4000.0).count() ===
      table.toDF.filter(col("v") > 4000.0).count())
  }

  test("IsNull never prunes files whose nulls hide in min/max-less row groups") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("skip-null"), "skipnull", StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    // file A: a small parquet page/row-group layout where s has nulls; also
    // an all-null companion column scenario: write nulls-only then values
    t.append(Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "s").coalesce(1))
    t.append(Seq((3L, "x"), (4L, "y")).toDF("id", "s").coalesce(1))
    // IsNull must find the null rows: the all-null file has no s min/max
    // (so no stats entry to prune on) and must survive the file filter
    val nulls = t.scanWhere(col("s").isNull)
    assert(nulls.count() === 2)
    // the no-null file carries a KNOWN zero count and is correctly pruned
    assert(nulls.inputFiles.length === 1)
    assert(t.scanWhere(col("s").isNotNull).count() === 2)
  }

  test("partitioned tables combine partition-value and stats pruning") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("skip-part"), "skip2", StructType(Seq(
      StructField("id", LongType), StructField("part", StringType))),
      partitionCols = Seq("part"))
    t.append((0 until 100).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part").coalesce(1))
    t.append((1000 until 1100).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part").coalesce(1))
    val df = t.scanWhere(col("part") === "p0" && col("id") >= 1000L)
    assert(df.inputFiles.length === 1)
    assert(df.count() === 50)
  }

  test("write.parquet.bloom-filter-enabled.column.X writes parquet bloom filters") {
    import spark.implicits._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val t = GraftTable.create(spark, tmpDir("bloom"), "bloomt", StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType))),
      props = Map("write.parquet.bloom-filter-enabled.column.tag" -> "true"))
    t.append((0 until 2000).map(i => (i.toLong, s"tag-$i")).toDF("id", "tag").coalesce(1))
    def bloomCols(path: String): Set[String] = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        spark.sparkContext.hadoopConfiguration))
      try {
        val block = r.getFooter.getBlocks.get(0)
        val br = r.getBloomFilterDataReader(block)
        import scala.jdk.CollectionConverters._
        block.getColumns.asScala
          .filter(c => br.readBloomFilter(c) != null)
          .map(_.getPath.toDotString).toSet
      } finally r.close()
    }
    val file = s"${t.dataDir}/${t.meta.currentSnapshot.get.files.head.path}"
    // bloom present exactly on the configured column
    assert(bloomCols(file) === Set("tag"))
    // equality reads through the bloom-filtered path stay correct
    assert(t.toDF.filter(col("tag") === "tag-777").count() === 1)
    assert(t.toDF.filter(col("tag") === "absent").count() === 0)
    // a table without the property writes no blooms
    val p = GraftTable.create(spark, tmpDir("nobloom"), "nb", StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType))))
    p.append(Seq((1L, "a")).toDF("id", "tag"))
    val f2 = s"${p.dataDir}/${p.meta.currentSnapshot.get.files.head.path}"
    assert(bloomCols(f2) === Set.empty)
  }

  // manifest-level blooms: every file's [min,max] straddles every probe
  // value (values interleave mod 4 across the appends), so footer stats
  // prune NOTHING — only the per-file bitset can skip files
  private lazy val bloomTable: GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("mbloom"), "mbloom", StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType),
      StructField("v", DoubleType))),
      props = Map(
        "write.metadata.bloom-filter.column.tag" -> "true",
        "write.metadata.bloom-filter.column.id" -> "true",
        "write.metadata.bloom-filter.column.v" -> "true", // double: ignored
        "write.metadata.bloom-filter.expected-items" -> "4096",
        "write.metadata.bloom-filter.fpp" -> "0.001"))
    for (b <- 0 until 4) {
      val df = (0 until 250).map { i =>
        val k = i * 4 + b
        (k.toLong, f"v$k%04d", k * 1.5)
      }.toDF("id", "tag", "v")
      t.append(df.coalesce(1))
    }
    t
  }

  test("manifest blooms: commit records filters for configured bloomable columns only") {
    val files = bloomTable.meta.currentSnapshot.get.files
    assert(files.size === 4)
    files.foreach { f =>
      val b = f.blooms.getOrElse(fail(s"no blooms on ${f.path}"))
      assert(b.keySet === Set("id", "tag")) // v is double: not bloomable
      // stats overlap across every file: min/max alone could never skip
      val st = f.stats.get("tag")
      assert(st.min <= "v0004" && st.max >= "v0993")
    }
  }

  test("manifest blooms skip files min/max stats cannot") {
    // tag 'v0005' lives only in batch 1 (5 = 4*1+1); all four files'
    // [min,max] contain it, so any pruning below 4 is bloom-driven
    val df = bloomTable.scanWhere(col("tag") === "v0005")
    assert(df.inputFiles.length < 4)
    assert(df.count() === 1)
    // long column probes prune too (literal renders through the same
    // stat-string domain the build side hashed)
    val byId = bloomTable.scanWhere(col("id") === 6L)
    assert(byId.inputFiles.length < 4)
    assert(byId.count() === 1)
    // absent values: typically zero files read, and always zero rows
    assert(bloomTable.scanWhere(col("tag") === "nope").count() === 0)
  }

  test("manifest blooms stay conservative on incompatible probes and other predicates") {
    // double literal against the long column: rendering domains differ
    // ("6" built vs "6.0" probed) — bloom must be SKIPPED, not mis-prune;
    // stats cannot help either (ranges overlap), so all files are read
    val df = bloomTable.scanWhere(col("id") === lit(6.5d))
    assert(df.inputFiles.length === 4)
    assert(df.count() === 0)
    // range predicates never consult blooms; results stay exact
    assert(bloomTable.scanWhere(col("id") >= 990L).count() === 10)
    // conjunction: bloom prunes through its conjunct
    val conj = bloomTable.scanWhere(col("tag") === "v0005" && col("id") >= 0L)
    assert(conj.inputFiles.length < 4)
    assert(conj.count() === 1)
  }

  test("manifest blooms survive the metadata round trip and rename conservatively") {
    // reload from disk: blooms come back through the manifest JSON
    val re = GraftTable.load(spark, bloomTable.location)
    val f = re.meta.currentSnapshot.get.files.head
    assert(f.blooms.exists(_.contains("tag")))
    assert(re.scanWhere(col("tag") === "v0005").inputFiles.length < 4)
    // rename: blooms stay keyed by the old name, probes under the new
    // name fall back to keep-the-file — and results stay correct
    re.renameColumn("tag", "label")
    val renamed = re.scanWhere(col("label") === "v0005")
    assert(renamed.inputFiles.length === 4)
    assert(renamed.count() === 1)
  }
}
