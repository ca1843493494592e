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
    assert(r.snapshots.forall(s => s.manifest.isDefined && s.inlineFiles.isEmpty))
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
    assert(t.meta.snapshots.forall(_.manifest.isDefined))
  }

  test("expire_snapshots removes the expired snapshot's manifest file") {
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
    assert(manifests.size === 3)
    val expired = t.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    assert(expired.nonEmpty)
    // expired snapshots' manifests are gone; retained ones remain readable
    assert(manifests.size === 3 - expired.size)
    assert(t.toDF.count() === 3)
  }
}
