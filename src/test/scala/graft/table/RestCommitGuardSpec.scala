package graft.table

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.types._

import graft.SparkTestBase

/**
 * TRUE multi-process catalog-service commits: two foreign JVMs plus this
 * session all append to one table, every commit claiming its version slot
 * over HTTP against [[RestCatalogServer]]'s atomic put-if-absent — the
 * reference's REST-catalog topology (IcebergSupport.scala:26-30), with
 * the process boundary the embedded-Derby JDBC spec cannot cross. No
 * commit may be lost, lineage must stay linear, and every claimed slot
 * must be a real committed version.
 */
class RestCommitGuardSpec extends SparkTestBase {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two foreign JVMs + this session commit through the HTTP CAS; zero lost commits") {
    import spark.implicits._
    val service = new RestCatalogServer
    val url = service.start()
    val restore = RestCommitGuard.installGlobally(url)
    try {
      val loc = tmpDir("rest-xproc")
      val t = GraftTable.create(spark, loc, "rx", StructType(Seq(
        StructField("writer", IntegerType), StructField("v", LongType))))

      val javaBin = s"${sys.props("java.home")}/bin/java"
      def launch(writer: Int): (Process, java.io.File) = {
        val log = java.nio.file.Files
          .createTempFile(s"rest-child$writer-", ".log").toFile
        val cmd = Seq(javaBin) ++ addOpens ++ Seq(
          "-Xmx3g", "-Dspark.ui.enabled=false",
          "graft.tools.RestCommitAppender", loc, writer.toString, "4", url)
        val pb = new ProcessBuilder(cmd: _*)
        pb.environment().put("CLASSPATH", sys.props("java.class.path"))
        pb.redirectErrorStream(true)
        pb.redirectOutput(log)
        (pb.start(), log)
      }

      val children = Seq(launch(1), launch(2))
      (0 until 4).foreach { i =>
        t.append(Seq.tabulate(10)(j => (0, i * 10L + j)).toDF("writer", "v"))
      }
      children.foreach { case (p, log) =>
        def tail = scala.io.Source.fromFile(log).getLines().toSeq.takeRight(30)
          .mkString("\n")
        assert(p.waitFor(300, TimeUnit.SECONDS), s"child timed out; log tail:\n$tail")
        assert(p.exitValue() === 0, s"child JVM failed; log tail:\n$tail")
      }

      assert(t.toDF.count() === 120)
      assert(t.toDF.groupBy("writer").count().collect()
        .forall(_.getLong(1) === 40))
      val snaps = t.meta.snapshots.sortBy(_.id)
      assert(snaps.size === 12)
      snaps.sliding(2).foreach {
        case Seq(a, b) => assert(b.parentId.contains(a.id))
        case _ =>
      }
      // every service-adjudicated slot is a real version: create + 12
      // appends = 13 claimed metadata slots
      assert(service.claimedSlots === 13)
    } finally {
      SnapshotLog.commitGuardFor = restore
      service.stop()
    }
  }

  test("crash heal over HTTP: a loser re-creates the winner's file from the 409 body") {
    val service = new RestCatalogServer
    val url = service.start()
    try {
      val guard = new RestCommitGuard(url)
      val conf = new org.apache.hadoop.conf.Configuration()
      val dir = new org.apache.hadoop.fs.Path(tmpDir("rest-heal"))
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val target = new org.apache.hadoop.fs.Path(dir, "v00003.metadata.json")
      def stage(name: String, bytes: Array[Byte]) = {
        val p = new org.apache.hadoop.fs.Path(dir, name)
        val out = fs.create(p, true); out.write(bytes); out.close(); p
      }
      val winner = """{"w":1}""".getBytes("UTF-8")
      guard.publish(fs, stage("t1", winner), target, winner)
      fs.delete(target, false) // winner "dies" after claim
      val loser = """{"w":2}""".getBytes("UTF-8")
      val e = intercept[IllegalStateException] {
        guard.publish(fs, stage("t2", loser), target, loser)
      }
      assert(e.getMessage.contains("Concurrent commit"))
      val landed = {
        val in = fs.open(target)
        try {
          val bytes = new Array[Byte](fs.getFileStatus(target).getLen.toInt)
          in.readFully(bytes); bytes
        } finally in.close()
      }
      assert(java.util.Arrays.equals(landed, winner))
    } finally service.stop()
  }
}
