package graft.table

import java.net.URI
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * An object-store-shaped Hadoop FileSystem (s3a semantics, test double):
 *
 *  - `rename` is COPY+DELETE onto the destination — an existing target is
 *    silently replaced (last-writer-wins), never an atomic no-overwrite
 *    CAS, and POSIX link(2) does not exist;
 *  - LISTING is eventually consistent: a newly created file can stay
 *    invisible to `listStatus` for a configured number of calls
 *    (per-path opt-in via [[ObjectStoreFileSystem.stalePredicate]]),
 *    while `getFileStatus`/`exists`/`open` stay strong — the modern-S3
 *    read-after-write contract with a legacy-listing lag.
 *
 * This is the storage class the CommitGuard seam exists for: the
 * filesystem cannot adjudicate a multi-writer commit, a catalog service
 * (JDBC/REST) must. [[ObjectStoreFsSpec]] proves the claim.
 */
class ObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftobj"
  override def getUri: URI = URI.create("graftobj:///")

  /** S3-style rename: the destination is replaced if present; the
    * operation can never carry a compare-and-swap. */
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && getFileStatus(dst).isFile) delete(dst, false)
    super.rename(src, dst)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    ObjectStoreFileSystem.registerCreate(f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f)
      .filterNot(st => ObjectStoreFileSystem.hiddenFromListing(st.getPath))
      .map(eager)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))

  /** RawLocalFileSystem statuses load permissions LAZILY via
    * `new java.io.File(path.toUri)`, which rejects the graftobj scheme —
    * return eagerly-populated plain statuses instead (object stores have
    * no POSIX permissions anyway). */
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      null, null, st.getPath)
}

object ObjectStoreFileSystem {
  /** Files matching this predicate at create time stay invisible to
    * listStatus for [[listLagCalls]] encounters (strong reads, lagging
    * listings). Default: no staleness. */
  @volatile var stalePredicate: Path => Boolean = _ => false
  @volatile var listLagCalls: Int = 0

  private val hidden = TrieMap.empty[String, AtomicInteger]

  def reset(): Unit = { hidden.clear(); stalePredicate = _ => false; listLagCalls = 0 }

  private[table] def registerCreate(f: Path): Unit =
    if (listLagCalls > 0 && stalePredicate(f))
      hidden.putIfAbsent(f.toUri.getPath, new AtomicInteger(listLagCalls))

  private[table] def hiddenFromListing(f: Path): Boolean =
    hidden.get(f.toUri.getPath).exists { c =>
      if (c.getAndDecrement() > 0) true
      else { hidden.remove(f.toUri.getPath); false }
    }
}

/**
 * Object-store commit/IO proof (round 17): the full table protocol runs
 * on a store with overwriting rename and eventually-stale listing,
 * PROVIDED commits route through a catalog-service guard — the seam
 * README/scaladoc claimed and this spec now demonstrates. The first test
 * pins the storage hazard itself (why the rename CAS is unsound here);
 * the rest race real committers through the embedded-Derby JDBC guard on
 * this filesystem and run append/merge/delete/expire plus a changelog
 * stream end-to-end.
 */
class ObjectStoreFsSpec extends SparkTestBase {

  private def installFs(): Unit = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftobj.impl", classOf[ObjectStoreFileSystem].getName)
    ObjectStoreFileSystem.reset()
  }

  private def objDir(name: String): String =
    "graftobj://" + tmpDir(s"objstore-$name")

  private def derbyUrl(name: String): String =
    s"jdbc:derby:${tmpDir(s"objstore-derby-$name")}/db;create=true"

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "grp", "v")
  }

  test("the storage hazard: rename replaces an existing target, so a filesystem CAS cannot adjudicate") {
    installFs()
    val dir = new Path(objDir("hazard"))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[ObjectStoreFileSystem])
    fs.mkdirs(dir)
    def put(name: String, s: String): Path = {
      val p = new Path(dir, name)
      val out = fs.create(p, true); out.write(s.getBytes("UTF-8")); out.close(); p
    }
    val target = put("v00001.metadata.json", "writer-A")
    val loser = put("tmp-b.json", "writer-B")
    // on a POSIX store this rename would fail (target exists) and the
    // RenameCommitGuard's read-back would catch the loss; here it
    // SUCCEEDS and silently replaces A — last-writer-wins, no CAS
    assert(fs.rename(loser, target),
      "object-store rename must overwrite, that is the hazard under test")
    val in = fs.open(target)
    val landed = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(landed === "writer-B")
  }

  test("racing committers through the JDBC guard on the object store: zero lost updates") {
    installFs()
    val restore = JdbcCommitGuard.installGlobally(derbyUrl("race"))
    try {
      val t = GraftTable.create(spark, objDir("race"), "objrace", StructType(Seq(
        StructField("writer", IntegerType), StructField("v", LongType))))
      import spark.implicits._
      val pool = Executors.newFixedThreadPool(4)
      (0 until 4).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit =
            (0 until 4).foreach { i =>
              t.append(Seq.tabulate(10)(j => (w, i * 10L + j)).toDF("writer", "v"))
            }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(300, TimeUnit.SECONDS))
      assert(t.toDF.count() === 160)
      assert(t.toDF.groupBy("writer").count().collect().forall(_.getLong(1) === 40))
      val snaps = t.meta.snapshots.sortBy(_.id)
      assert(snaps.size === 16)
      snaps.sliding(2).foreach {
        case Seq(a, b) => assert(b.parentId.contains(a.id),
          "the snapshot chain must be a single linear history — no lost update")
        case _ =>
      }
    } finally { SnapshotLog.commitGuardFor = restore; ObjectStoreFileSystem.reset() }
  }

  test("append/merge/delete/expire + changelog stream run green on the object store") {
    import spark.implicits._
    installFs()
    val restore = JdbcCommitGuard.installGlobally(derbyUrl("e2e"))
    try {
      val t = GraftTable.create(spark, objDir("e2e"), "obje2e", schema,
        props = Map("write.delete.vector.enabled" -> "true"))
      t.append(rows(0 until 30).repartition(2))
      // MERGE: update one row's v, insert two new ids
      val src = Seq((5L, "g2", -1.0), (100L, "gx", 1.0), (101L, "gx", 2.0))
        .toDF("id", "grp", "v")
      t.merge(src, Seq("id"))
      t.deleteWherePositional(col("id") === 7L)  // MoR DV commit
      t.deleteWhere(col("id") === 8L)            // CoW rewrite (masked path)
      t.rewriteDataFilesSorted(Seq(asc("id")))   // compaction
      t.expireSnapshots(olderThanMs = 0L, retainLast = 2,
        nowMs = System.currentTimeMillis() + 1000L)
      val got = t.toDF.as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
      val want = ((0L until 30L).filterNot(i => i == 7L || i == 8L).map(i =>
        (i, s"g${i % 3}", if (i == 5L) -1.0 else i * 1.5)) ++
        Seq((100L, "gx", 1.0), (101L, "gx", 2.0))).sortBy(_._1)
      assert(got === want)
      // the append-log stream tails the same store
      val t2 = GraftTable.create(spark, objDir("e2e-stream"), "objst", schema)
      t2.append(rows(0 until 5))
      val q = spark.readStream.format("graft-stream").load(t2.location)
        .writeStream.format("memory").queryName("objstore_tail").start()
      try {
        q.processAllAvailable()
        t2.append(rows(5 until 9))
        q.processAllAvailable()
        assert(spark.table("objstore_tail").count() === 9)
      } finally q.stop()
    } finally { SnapshotLog.commitGuardFor = restore; ObjectStoreFileSystem.reset() }
  }

  test("version discovery survives eventually-stale metadata listings (hint + probe-forward)") {
    import spark.implicits._
    installFs()
    val restore = JdbcCommitGuard.installGlobally(derbyUrl("stale"))
    try {
      // every new metadata file hides from the next 3 listings; exists()
      // and open() stay strong — the hint + forward-probe path must keep
      // readers and committers on the true head
      ObjectStoreFileSystem.stalePredicate =
        p => p.getName.endsWith(".metadata.json")
      ObjectStoreFileSystem.listLagCalls = 3
      val t = GraftTable.create(spark, objDir("stale"), "objstale", schema)
      (0 until 6).foreach { i =>
        t.append(rows(i * 10 until (i + 1) * 10))
        assert(t.toDF.count() === (i + 1) * 10,
          s"read after commit ${i + 1} must see the true head through the hint")
      }
      val chain = t.meta.snapshots.sortBy(_.id)
      assert(chain.size === 6)
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(b.parentId.contains(a.id))
        case _ =>
      }
    } finally { SnapshotLog.commitGuardFor = restore; ObjectStoreFileSystem.reset() }
  }

  test("ALTER TABLE RENAME TO moves the table directory on the object store") {
    installFs()
    val restore = JdbcCommitGuard.installGlobally(derbyUrl("rename"))
    try {
      // directory rename on an object store is copy+delete, not atomic —
      // the documented contract is "no concurrent writers"; this pins
      // that the move itself and every read after it work
      val wh = objDir("rename-wh")
      spark.conf.set("spark.sql.catalog.objrn",
        classOf[graft.table.catalog.GraftSparkCatalog].getName)
      spark.conf.set("spark.sql.catalog.objrn.warehouse", wh)
      spark.sql("CREATE TABLE objrn.db.a (id BIGINT) USING parquet")
      spark.sql("INSERT INTO objrn.db.a SELECT id FROM range(7)")
      spark.sql("ALTER TABLE objrn.db.a RENAME TO db.b")
      assert(spark.sql("SELECT count(*) FROM objrn.db.b")
        .collect().head.getLong(0) === 7L)
      intercept[Exception] { spark.sql("SELECT * FROM objrn.db.a").collect() }
      assert(GraftTable.load(spark, s"$wh/db/b").meta.name === "db.b")
    } finally { SnapshotLog.commitGuardFor = restore; ObjectStoreFileSystem.reset() }
  }
}
