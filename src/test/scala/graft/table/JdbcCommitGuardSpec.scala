package graft.table

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * The JDBC catalog-service CAS (embedded Derby in this sandbox; any
 * server-mode database in production). The first test races the raw CAS
 * from 16 threads — the database, not the filesystem, must adjudicate
 * exactly one winner. The rest run the full table commit protocol through
 * the guard: appends, retries, crash-heal.
 *
 * (Cross-PROCESS races need a server-mode database — the sandbox ships
 * embedded Derby only, which admits one JVM per database directory.
 * CrossProcessCommitSpec proves the multi-JVM protocol harness over the
 * filesystem CAS; this suite proves the SQL CAS adjudicates true
 * concurrency.)
 */
class JdbcCommitGuardSpec extends SparkTestBase {

  private def derbyUrl(name: String): String =
    s"jdbc:derby:${tmpDir(s"derby-$name")}/db;create=true"

  test("16 threads race one version slot: the SQL CAS yields exactly one winner") {
    val guard = new JdbcCommitGuard(derbyUrl("race"))
    val conf = new Configuration()
    val dir = new Path(tmpDir("jdbc-race-fs"))
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val target = new Path(dir, "v00001.metadata.json")

    val n = 16
    val wins = new AtomicInteger(0)
    val losses = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val payloads = (0 until n).map(i => s"""{"writer":$i}""".getBytes("UTF-8"))
    (0 until n).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val tmp = new Path(dir, s"tmp-$i.json")
          val out = fs.create(tmp, true)
          out.write(payloads(i)); out.close()
          start.await()
          try { guard.publish(fs, tmp, target, payloads(i)); wins.incrementAndGet() }
          catch {
            case e: IllegalStateException if e.getMessage.contains("Concurrent commit") =>
              losses.incrementAndGet()
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(wins.get() === 1, s"expected exactly one CAS winner, got ${wins.get()}")
    assert(losses.get() === n - 1)
    // the installed bytes are the winner's payload, verbatim
    val landed = {
      val in = fs.open(target)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(target).getLen.toInt)
        in.readFully(bytes); bytes
      } finally in.close()
    }
    assert(payloads.exists(java.util.Arrays.equals(_, landed)))
    // every tmp file was cleaned up on both paths
    assert(!fs.listStatus(dir).exists(_.getPath.getName.startsWith("tmp-")))
  }

  test("full commit protocol through the JDBC guard: appends, lineage, zero loss") {
    import spark.implicits._
    val restore = JdbcCommitGuard.installGlobally(derbyUrl("e2e"))
    try {
      val t = GraftTable.create(spark, tmpDir("jdbc-e2e"), "je", StructType(Seq(
        StructField("writer", IntegerType), StructField("v", LongType))))
      val pool = Executors.newFixedThreadPool(4)
      (0 until 4).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit =
            (0 until 5).foreach { i =>
              t.append(Seq.tabulate(10)(j => (w, i * 10L + j)).toDF("writer", "v"))
            }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(300, TimeUnit.SECONDS))
      assert(t.toDF.count() === 200)
      assert(t.toDF.groupBy("writer").count().collect().forall(_.getLong(1) === 50))
      val snaps = t.meta.snapshots.sortBy(_.id)
      assert(snaps.size === 20)
      snaps.sliding(2).foreach {
        case Seq(a, b) => assert(b.parentId.contains(a.id))
        case _ =>
      }
    } finally SnapshotLog.commitGuardFor = restore
  }

  test("crash heal: a loser re-materializes the winner's metadata file from the service") {
    val guard = new JdbcCommitGuard(derbyUrl("heal"))
    val conf = new Configuration()
    val dir = new Path(tmpDir("jdbc-heal-fs"))
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val target = new Path(dir, "v00007.metadata.json")
    val winner = """{"winner":true}""".getBytes("UTF-8")

    def stage(name: String, bytes: Array[Byte]): Path = {
      val p = new Path(dir, name)
      val out = fs.create(p, true); out.write(bytes); out.close(); p
    }
    guard.publish(fs, stage("t1.json", winner), target, winner)
    // simulate the winner dying between DB claim and file install
    fs.delete(target, false)
    val loser = """{"winner":false}""".getBytes("UTF-8")
    val e = intercept[IllegalStateException] {
      guard.publish(fs, stage("t2.json", loser), target, loser)
    }
    assert(e.getMessage.contains("Concurrent commit"))
    // the loser healed the file from the database's copy of the WINNER
    val landed = {
      val in = fs.open(target)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(target).getLen.toInt)
        in.readFully(bytes); bytes
      } finally in.close()
    }
    assert(java.util.Arrays.equals(landed, winner))
  }
}
