package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * `CALL system.snapshot` / `register_table` — the rest of Iceberg's
 * onboarding trio next to `add_files`. The load-bearing property is
 * INDEPENDENCE: clone maintenance (expire, remove_orphan_files, DROP)
 * must never cost the source a byte, and vice versa; a registered name
 * is a pointer whose drop unregisters without touching the table.
 */
class SnapshotCloneSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType),
    StructField("v", DoubleType)))

  private def fresh(rows: Int, name: String, parts: Seq[String] = Seq.empty): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir(s"sc-$name"), name, schema, parts)
    t.append((1L to rows.toLong).map(i => (s"p${i % 3}", i, i * 0.5))
      .toDF("k", "n", "v"))
    t
  }

  private def ino(p: java.nio.file.Path) =
    java.nio.file.Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()

  test("snapshotTo(link=true): zero-copy clone, then full mutual maintenance immunity") {
    import spark.implicits._
    val src = fresh(90, "sc_src", parts = Seq("k"))
    val clone = src.snapshotTo(tmpDir("sc-clone"), "sc_clone", link = true)

    // identical contents + layout; files are hard links (shared inodes)
    assert(clone.toDF.count() === 90)
    assert(clone.toDF.agg(sum("n")).head.getLong(0) ===
      src.toDF.agg(sum("n")).head.getLong(0))
    assert(clone.meta.partitionCols === Seq("k"))
    val srcInos = new java.io.File(src.location + "/data").listFiles
      .flatMap(d => Option(d.listFiles).getOrElse(Array(d)))
      .filter(_.getName.endsWith(".parquet")).map(f => ino(f.toPath)).toSet
    val cloneFiles = new java.io.File(clone.location + "/data").listFiles
      .flatMap(d => Option(d.listFiles).getOrElse(Array(d)))
      .filter(_.getName.endsWith(".parquet"))
    assert(cloneFiles.nonEmpty)
    cloneFiles.foreach(f => assert(srcInos.contains(ino(f.toPath)),
      s"${f.getName} is not a link to a source file"))
    // stats rode along: a point filter prunes the clone's files
    assert(clone.scanWhere(col("n") === 1L).inputFiles.length
      < clone.toDF.inputFiles.length)

    // the clone evolves independently of the source
    clone.append(Seq(("x", 1000L, 9.9)).toDF("k", "n", "v"))
    clone.deleteWhere(col("n") <= 30L)
    assert(clone.toDF.count() === 61)
    assert(src.toDF.count() === 90, "clone writes must not leak into the source")

    // clone maintenance never costs the source a byte
    clone.rewriteDataFilesSorted(Seq(asc("n")))
    clone.expireSnapshots(System.currentTimeMillis() + 100000, retainLast = 1)
    clone.removeOrphanFiles(dryRun = false, olderThanMs = System.currentTimeMillis() + 100000)
    assert(src.toDF.count() === 90)
    assert(src.toDF.agg(sum("n")).head.getLong(0) === 4095L)

    // ... and DROP of the clone leaves the source intact
    GraftTable.drop(spark, clone.location)
    assert(src.toDF.count() === 90)

    // source maintenance never touches a (second) clone either
    val clone2 = src.snapshotTo(tmpDir("sc-clone2"), "sc_clone2", link = true)
    src.append(Seq(("y", 2000L, 1.0)).toDF("k", "n", "v"))
    src.rewriteDataFilesSorted(Seq(asc("n")))
    src.expireSnapshots(System.currentTimeMillis() + 100000, retainLast = 1)
    src.removeOrphanFiles(dryRun = false, olderThanMs = System.currentTimeMillis() + 100000)
    assert(clone2.toDF.count() === 90)
    assert(clone2.toDF.agg(sum("n")).head.getLong(0) === 4095L)
  }

  // tagged slow (r18 budget trim): the 2560-file fixture build alone is
  // ~1 min; the small-clone tests above keep the link path covered
  test("snapshotTo(link=true): a many-file clone links in parallel, in seconds, inode-proven",
      graft.SlowTest) {
    import spark.implicits._
    // thousands of REAL files: one tiny parquet per commit would be slow,
    // so write a heavily fragmented frame in a handful of appends
    val t = GraftTable.create(spark, tmpDir("sc-many"), "sc_many", schema)
    (0 until 4).foreach { b =>
      t.append((1L to 640L).map(i => (s"p${i % 3}", b * 1000L + i, i * 0.5))
        .toDF("k", "n", "v").repartition(640))
    }
    val nFiles = t.meta.currentSnapshot.get.files.size
    assert(nFiles >= 1500, s"fixture must be file-fragmented, got $nFiles")
    val t0 = System.nanoTime()
    val clone = t.snapshotTo(tmpDir("sc-many-clone"), "sc_many_clone",
      link = true)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"parallel linker took $secs s for $nFiles files")
    assert(clone.meta.currentSnapshot.get.files.size === nFiles,
      "deterministic manifest: every source entry, exactly once")
    assert(clone.toDF.count() === t.toDF.count())
    // zero-copy proof: a clone file shares its inode with a source file
    def parquets(dir: String) = new java.io.File(dir)
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.toPath)
    val srcInos = parquets(t.dataDir).map(ino).toSet
    val cloneFiles = parquets(clone.dataDir)
    assert(cloneFiles.nonEmpty && cloneFiles.forall(p => srcInos.contains(ino(p))),
      "every linked clone file must share an inode with a source file")
    GraftTable.drop(spark, clone.location)
    assert(t.toDF.count() === 4 * 640, "dropping the clone leaves the source whole")
  }

  test("snapshotTo (metadata-only default): O(metadata) clone via absolute-base entries") {
    import spark.implicits._
    val src = fresh(90, "sc_ref_src", parts = Seq("k"))
    val clone = src.snapshotTo(tmpDir("sc-refclone"), "sc_refclone")

    // METADATA-ONLY: the clone's data dir holds zero files — the entries
    // reference the source's files by absolute base (no per-file driver
    // filesystem work, however many files the source holds)
    def parquetFilesUnder(dir: String) = {
      val d = new java.io.File(dir)
      if (!d.exists()) Array.empty[java.io.File]
      else d.listFiles.flatMap(x => Option(x.listFiles).getOrElse(Array(x)))
        .filter(_.getName.endsWith(".parquet"))
    }
    assert(parquetFilesUnder(clone.location + "/data").isEmpty,
      "a metadata-only clone must not materialize files under its data dir")
    assert(clone.meta.currentSnapshot.get.files.forall(_.base.isDefined))

    // identical contents, partition layout, and stat pruning
    assert(clone.toDF.count() === 90)
    assert(clone.toDF.agg(sum("n")).head.getLong(0) === 4095L)
    assert(clone.meta.partitionCols === Seq("k"))
    assert(clone.toDF.filter(col("k") === "p1").count() ===
      src.toDF.filter(col("k") === "p1").count())
    assert(clone.scanWhere(col("n") === 1L).inputFiles.length
      < clone.toDF.inputFiles.length)

    // the clone evolves independently: local appends + CoW delete
    clone.append(Seq(("x", 1000L, 9.9)).toDF("k", "n", "v"))
    clone.deleteWhere(col("n") <= 30L)
    assert(clone.toDF.count() === 61)
    assert(src.toDF.count() === 90, "clone writes must not leak into the source")

    // clone maintenance never deletes a based entry's bytes: compaction
    // rewrites externals into local files, then expire + orphan GC of the
    // clone must not cross the table boundary into the source
    clone.rewriteDataFilesSorted(Seq(asc("n")))
    clone.expireSnapshots(System.currentTimeMillis() + 100000, retainLast = 1)
    val collected = clone.removeOrphanFiles(dryRun = false,
      olderThanMs = System.currentTimeMillis() + 100000)
    assert(src.toDF.count() === 90,
      s"clone maintenance deleted source bytes (orphans collected: $collected)")
    assert(src.toDF.agg(sum("n")).head.getLong(0) === 4095L)
    assert(clone.toDF.count() === 61)

    // ... and DROP of a (fresh, still-external) clone leaves the source whole
    val clone2 = src.snapshotTo(tmpDir("sc-refclone2"), "sc_refclone2")
    // a clone of a CLONE keeps pointing at the original owner's data dir
    val clone3 = clone2.snapshotTo(tmpDir("sc-refclone3"), "sc_refclone3")
    assert(clone3.meta.currentSnapshot.get.files.forall(
      _.base.contains(src.dataDir)))
    GraftTable.drop(spark, clone2.location)
    GraftTable.drop(spark, clone3.location)
    assert(src.toDF.count() === 90)
    assert(src.toDF.agg(sum("n")).head.getLong(0) === 4095L)
  }

  test("snapshot refuses MoR-delete and era-bearing sources") {
    import spark.implicits._
    val mor = fresh(30, "sc_mor")
    mor.deleteWhereMoR(col("n") <= 5L, keyCols = Seq("n"))
    val e1 = intercept[IllegalArgumentException] {
      mor.snapshotTo(tmpDir("sc-morclone"), "x")
    }
    assert(e1.getMessage.contains("delete files"))

    val renamed = fresh(30, "sc_ren")
    renamed.renameColumn("v", "w")
    val e2 = intercept[IllegalArgumentException] {
      renamed.snapshotTo(tmpDir("sc-renclone"), "x")
    }
    assert(e2.getMessage.contains("era"))
  }

  test("SQL procedures: CALL snapshot + register_table; dropping a registered name unregisters only") {
    import graft.table.catalog.GraftSparkCatalog
    val wh = java.nio.file.Files.createTempDirectory("sc-wh").toString
    spark.conf.set("spark.sql.catalog.sccat", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.sccat.warehouse", wh)
    val src = fresh(40, "sc_sql_src")
    // register the path-based table under a catalog name
    val reg = spark.sql(
      s"CALL sccat.system.register_table('ns.reg', '${src.location}')").collect()
    assert(reg.head.getString(0) === "ns.reg")
    assert(spark.sql("SELECT count(*) AS n FROM sccat.ns.reg")
      .head.getLong(0) === 40)
    // writes through the registered name hit the underlying table
    spark.sql("INSERT INTO sccat.ns.reg VALUES ('z', 999, 0.5)")
    assert(src.toDF.count() === 41)
    // snapshot-clone the registered table under a new catalog name
    val snap = spark.sql(
      "CALL sccat.system.snapshot('ns.reg', 'ns.clone')").collect()
    assert(snap.head.getString(0) === "ns.clone")
    assert(snap.head.getInt(1) > 0)
    assert(spark.sql("SELECT count(*) AS n FROM sccat.ns.clone")
      .head.getLong(0) === 41)
    // the clone is listed, independent, and drops without touching ns.reg
    spark.sql("INSERT INTO sccat.ns.clone VALUES ('c', 1, 1.0)")
    assert(spark.sql("SELECT count(*) FROM sccat.ns.reg").head.getLong(0) === 41)
    spark.sql("DROP TABLE sccat.ns.clone")
    assert(src.toDF.count() === 41)
    // link => true from SQL: the physical-immunity escape hatch — the
    // clone carries NO external entries and hard-links into its own data/
    spark.sql(
      "CALL sccat.system.snapshot('ns.reg', 'ns.linkclone', link => true)")
    val lc = GraftTable.load(spark, s"$wh/ns/linkclone")
    assert(lc.meta.currentSnapshot.get.files.forall(_.base.isEmpty),
      "a link-mode clone must own its files (no absolute-base entries)")
    assert(spark.sql("SELECT count(*) FROM sccat.ns.linkclone")
      .head.getLong(0) === 41)
    spark.sql("DROP TABLE sccat.ns.linkclone")
    // dropping the REGISTERED name unregisters the pointer only
    spark.sql("DROP TABLE sccat.ns.reg")
    assert(GraftTable.exists(spark, src.location),
      "dropping a registered name must not drop the table it points at")
    assert(src.toDF.count() === 41)
    // double-register of an occupied name is refused
    spark.sql(s"CALL sccat.system.register_table('ns.reg2', '${src.location}')")
    val e = intercept[Exception] {
      spark.sql(s"CALL sccat.system.register_table('ns.reg2', '${src.location}')")
    }
    assert(e.getMessage.contains("already exists"))
  }
}
