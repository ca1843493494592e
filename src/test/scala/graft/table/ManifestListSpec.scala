package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The manifest-list step: per-snapshot file lists live in their own
  * immutable manifest files, so the root metadata — what every log read
  * parses — stays O(snapshots) no matter how many data files accumulate. */
class ManifestListSpec extends SparkTestBase {

  private val schemaJson =
    StructType(Seq(StructField("p", StringType), StructField("v", LongType))).json

  private def dataFile(i: Int) =
    DataFile(s"p=0/f$i.parquet", Map("p" -> "0"), records = 10, sizeBytes = 100)

  test("root metadata does not scale with file count; lists load lazily") {
    val loc = tmpDir("manifest-scale")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(loc).getFileSystem(conf)
    def metaSize(v: Int): Long =
      fs.getFileStatus(new Path(s"$loc/_graft/" + f"v$v%05d.metadata.json")).getLen

    var m = SnapshotLog.commit(loc,
      SnapshotLog.initial("big", schemaJson, Seq("p"), Map.empty), conf)

    // commit a 10-file snapshot, then a 10_000-file one
    val small = GraftSnapshot(1, None, 1L, "append",
      (0 until 10).map(dataFile), Seq.empty, Seq.empty, Map.empty)
    m = SnapshotLog.commit(loc,
      m.copy(refs = Map(SnapshotLog.MainBranch -> 1L),
        snapshots = Seq(small)), conf)
    val sizeAt10 = metaSize(2)

    val big = GraftSnapshot(2, Some(1), 2L, "append",
      (0 until 10000).map(dataFile), Seq.empty, Seq.empty, Map.empty)
    m = SnapshotLog.commit(loc,
      m.copy(refs = Map(SnapshotLog.MainBranch -> 2L),
        snapshots = m.snapshots :+ big), conf)
    val sizeAt10k = metaSize(3)

    // 1000x the files must not inflate what a log read parses: the root
    // grew only by one manifest REFERENCE, not by 10k file entries
    assert(sizeAt10k < sizeAt10 + 500,
      s"root metadata absorbed file entries: $sizeAt10 -> $sizeAt10k bytes")

    // both snapshots externalized; the 10k entries live in a manifest file
    val r = SnapshotLog.read(loc, conf)
    assert(r.snapshots.forall(s => s.manifestRefs.nonEmpty && s.inlineFiles.isEmpty))
    assert(r.snapshot(2).get.files.size === 10000)
    assert(r.snapshot(1).get.files.size === 10)
    // a further commit reuses prior manifests untouched (immutable)
    val manifestsBefore = fs.listStatus(new Path(s"$loc/_graft"))
      .map(_.getPath.getName).filter(_.startsWith("manifest-")).toSet
    SnapshotLog.commit(loc, r.copy(props = r.props + ("touched" -> "1")), conf)
    val manifestsAfter = fs.listStatus(new Path(s"$loc/_graft"))
      .map(_.getPath.getName).filter(_.startsWith("manifest-")).toSet
    assert(manifestsAfter === manifestsBefore)
  }

  test("rewrite_manifests collects aged orphan manifests, never live ones") {
    import spark.implicits._
    val loc = tmpDir("manifest-orphan")
    val t = GraftTable.create(spark, loc, "morph", StructType(Seq(
      StructField("p", StringType), StructField("v", LongType))),
      partitionCols = Seq("p"))
    t.append(Seq(("a", 1L)).toDF("p", "v"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(loc).getFileSystem(conf)
    // simulate a writer that died after its manifest write, before its CAS
    val orphan = new Path(s"$loc/_graft/manifest-99999-deadbeef.json")
    val out = fs.create(orphan, false)
    try out.write("""{"files":[],"deleteFiles":[]}""".getBytes("UTF-8"))
    finally out.close()
    // too young: the age guard protects a possibly in-flight commit
    assert(t.rewriteManifests() === Seq.empty)
    assert(fs.exists(orphan))
    // aged out: collected; the live snapshot's manifest survives
    val collected = t.rewriteManifests(olderThanMs = System.currentTimeMillis() + 1000)
    assert(collected === Seq("manifest-99999-deadbeef.json"))
    assert(!fs.exists(orphan))
    assert(t.toDF.count() === 1)
    assert(t.meta.snapshots.forall(_.manifestRefs.nonEmpty))
  }

  test("expire_snapshots reference-counts shared manifests") {
    import spark.implicits._
    val loc = tmpDir("manifest-expire")
    val t = GraftTable.create(spark, loc, "mexp", StructType(Seq(
      StructField("p", StringType), StructField("v", LongType))),
      partitionCols = Seq("p"))
    t.append(Seq(("a", 1L)).toDF("p", "v"))
    t.append(Seq(("a", 2L)).toDF("p", "v"))
    t.append(Seq(("a", 3L)).toDF("p", "v"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(loc).getFileSystem(conf)
    def manifests: Set[String] = fs.listStatus(new Path(s"$loc/_graft"))
      .map(_.getPath.getName).filter(_.startsWith("manifest-")).toSet
    // three amortized appends: one add-only manifest each, chains shared
    assert(manifests.size === 3)
    assert(t.meta.currentSnapshot.get.manifestRefs.size === 3)
    val expired = t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    assert(expired.size === 2)
    // the retained head still references ALL three manifests (appends
    // share their parents' manifests), so none may be deleted
    assert(manifests.size === 3)
    assert(t.toDF.count() === 3)
    // compacting the head chain to one manifest un-references the three
    // add-only manifests; the same call's GC then collects them
    t.rewriteManifests(
      olderThanMs = System.currentTimeMillis() + 1000, maxManifests = 1)
    assert(t.meta.currentSnapshot.get.manifestRefs.size === 1)
    assert(manifests.size === 1)
    assert(t.toDF.count() === 3)
  }

  test("appending to a big table writes O(added) metadata, reusing parent manifests") {
    val loc = tmpDir("manifest-amortized")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(loc).getFileSystem(conf)
    var m = SnapshotLog.commit(loc,
      SnapshotLog.initial("amort", schemaJson, Seq("p"), Map.empty), conf)
    // a 10_000-file base snapshot -> externalized into one big manifest
    val base = GraftSnapshot(1, None, 1L, "append",
      (0 until 10000).map(dataFile), Seq.empty, Seq.empty, Map.empty)
    m = SnapshotLog.commit(loc,
      m.copy(refs = Map(SnapshotLog.MainBranch -> 1L), snapshots = Seq(base)), conf)
    def manifestStats: Map[String, Long] = fs.listStatus(new Path(s"$loc/_graft"))
      .filter(_.getPath.getName.startsWith("manifest-"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    val before = manifestStats
    assert(before.size === 1)
    // the amortized-append shape commitSnapshot produces: inline = the ONE
    // added file, manifest list = the parent's manifests untouched
    val head = m.currentSnapshot.get
    val add = GraftSnapshot(2, Some(1), 2L, "append",
      Seq(dataFile(10000)), Seq(dataFile(10000).path), Seq.empty, Map.empty,
      manifests = head.manifestRefs)
    m = SnapshotLog.commit(loc,
      m.copy(refs = Map(SnapshotLog.MainBranch -> 2L),
        snapshots = m.snapshots :+ add), conf)
    val after = manifestStats
    // exactly one NEW manifest, holding one file entry: O(added) bytes,
    // about 4 orders of magnitude below the 10k-entry parent manifest
    val fresh = after.keySet -- before.keySet
    assert(fresh.size === 1)
    val bigSize = before.values.head
    val newSize = after(fresh.head)
    assert(newSize < bigSize / 1000,
      s"append manifest is O(live)? parent=$bigSize bytes, new=$newSize bytes")
    // the parent's manifest is bit-identical (reused, not rewritten)
    assert(after(before.keySet.head) === bigSize)
    // and the union resolves to the full live set
    val r = SnapshotLog.read(loc, conf)
    assert(r.snapshot(2).get.files.size === 10001)
  }

  test("amortized append through GraftTable: O(added) manifest per commit") {
    import spark.implicits._
    val loc = tmpDir("manifest-amortized-table")
    val t = GraftTable.create(spark, loc, "amt", StructType(Seq(
      StructField("p", StringType), StructField("v", LongType))),
      partitionCols = Seq("p"))
    t.append(Seq(("a", 1L), ("b", 2L)).toDF("p", "v"))
    t.append(Seq(("a", 3L)).toDF("p", "v"))
    t.append(Seq(("b", 4L)).toDF("p", "v"))
    val m = t.meta
    val head = m.currentSnapshot.get
    // each append contributed one add-only manifest to the head's list
    assert(head.manifestRefs.size === 3)
    assert(t.toDF.count() === 4)
    // a removal commit (CoW delete) collapses the chain to ONE manifest
    t.deleteWhere(org.apache.spark.sql.functions.col("v") === 3L)
    val collapsed = t.meta.currentSnapshot.get
    assert(collapsed.manifestRefs.size === 1)
    assert(t.toDF.count() === 3)
  }

  test("manifest chains are bounded: the commit at the cap collapses to one") {
    import spark.implicits._
    val loc = tmpDir("manifest-chain-cap")
    val t = GraftTable.create(spark, loc, "cap", StructType(Seq(
      StructField("p", StringType), StructField("v", LongType))),
      partitionCols = Seq("p"),
      props = Map("write.manifest.max-chain" -> "3"))
    (1 to 8).foreach(i => t.append(Seq(("a", i.toLong)).toDF("p", "v")))
    val m = t.meta
    // no snapshot ever resolved through more than max-chain manifests;
    // the collapse commits show a single-manifest list
    assert(m.snapshots.forall(_.manifestRefs.size <= 3))
    assert(m.snapshots.exists(s => s.addedFiles.nonEmpty &&
      s.manifestRefs.size == 1 && s.files.size > 1),
      "expected a collapse commit materializing the full list")
    assert(t.toDF.count() === 8)
    assert(t.toDF.as[(String, Long)].collect().map(_._2).sorted.toSeq === (1L to 8L))
  }

  test("manifest_files metadata table reflects the physical manifest list") {
    import spark.implicits._
    val loc = tmpDir("manifest-files-df")
    val t = GraftTable.create(spark, loc, "mfd", StructType(Seq(
      StructField("p", StringType), StructField("v", LongType))),
      partitionCols = Seq("p"))
    t.append(Seq(("a", 1L), ("b", 2L)).toDF("p", "v")) // 2 files (2 parts)
    t.append(Seq(("a", 3L)).toDF("p", "v"))
    val rows = t.manifestFilesDF
      .orderBy("added_snapshot_id")
      .as[(String, Long, Long, Int, Int, Int)].collect()
    // two amortized appends -> two add-only manifests, in commit order
    assert(rows.length === 2)
    assert(rows.map(_._3).toSeq === Seq(1L, 2L)) // added_snapshot_id
    assert(rows.map(_._4).toSeq === Seq(2, 1))   // added counts
    assert(rows.forall(_._5 === 0))              // no carried-in entries
    assert(rows.forall(r => r._2 > 0 && r._1.startsWith("manifest-")))
    // a CoW delete collapses the chain: ONE manifest, survivors carried in
    t.deleteWhere(org.apache.spark.sql.functions.col("v") === 1L)
    val collapsed = t.manifestFilesDF
      .as[(String, Long, Long, Int, Int, Int)].collect()
    assert(collapsed.length === 1)
    assert(collapsed.head._4 + collapsed.head._5 === t.meta.currentSnapshot.get.files.size)
  }

  test("legacy metadata field names (files/deleteFiles) still read") {
    val loc = tmpDir("manifest-legacy")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(loc).getFileSystem(conf)
    // metadata as a pre-manifest-list build serialized it: snapshot file
    // lists INLINE under the old field names
    val legacy =
      s"""{"name":"leg","schemaJson":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.JsonDSL.string2jvalue(schemaJson))},
         |"partitionCols":["p"],"props":{},"refs":{"main":1},
         |"snapshots":[{"id":1,"parentId":null,"timestampMs":1,"operation":"append",
         |"files":[{"path":"p=0/f0.parquet","partitionValues":{"p":"0"},
         |"records":10,"sizeBytes":100}],
         |"addedFiles":["p=0/f0.parquet"],"removedFiles":[],"summary":{},
         |"deleteFiles":[]}],
         |"version":1,"lastUpdatedMs":1,"metadataLog":[]}""".stripMargin
    fs.mkdirs(new Path(s"$loc/_graft"))
    val out = fs.create(new Path(s"$loc/_graft/v00001.metadata.json"), false)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()
    val r = SnapshotLog.read(loc, conf)
    // json4s would silently default the unrecognized old keys to empty
    // lists — the migration shim must surface the legacy file entries
    assert(r.snapshot(1).get.files.map(_.path) === Seq("p=0/f0.parquet"))
    assert(r.snapshot(1).get.files.head.records === 10)
  }
}
