package graft.table

import java.util.concurrent.TimeUnit

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** TRUE multi-writer commit protocol: competing JVMs append to the same
  * table concurrently. The per-table in-process lock cannot serialize
  * foreign processes, so every commit races through the filesystem CAS
  * (hard-link claim on local FS) and retries on conflict — no commit may
  * be lost and the snapshot lineage must stay linear. */
class CrossProcessCommitSpec extends SparkTestBase {

  // Spark 4.x on JDK 17 module options, matching build.sbt's fork settings
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two foreign JVMs + this session append concurrently; zero lost commits") {
    import spark.implicits._
    val loc = tmpDir("xproc")
    val t = GraftTable.create(spark, loc, "xproc", StructType(Seq(
      StructField("writer", IntegerType), StructField("v", LongType))))

    val javaBin = s"${sys.props("java.home")}/bin/java"
    def launch(writer: Int): (Process, java.io.File) = {
      val log = java.nio.file.Files
        .createTempFile(s"xproc-child$writer-", ".log").toFile
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx3g", "-Dspark.ui.enabled=false",
        "graft.tools.ConcurrentAppender", loc, writer.toString, "4")
      val pb = new ProcessBuilder(cmd: _*)
      // classpath via environment: the forked-test classpath is too long
      // for a comfortable argv and java honors CLASSPATH when -cp is absent
      pb.environment().put("CLASSPATH", sys.props("java.class.path"))
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      (pb.start(), log)
    }

    val children = Seq(launch(1), launch(2))
    // the parent is writer 0, racing from this JVM through the same CAS
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(10)(j => (0, i * 10L + j)).toDF("writer", "v"))
    }
    children.foreach { case (p, log) =>
      def tail = scala.io.Source.fromFile(log).getLines().toSeq.takeRight(30)
        .mkString("\n")
      assert(p.waitFor(300, TimeUnit.SECONDS), s"child timed out; log tail:\n$tail")
      assert(p.exitValue() === 0, s"child JVM failed; log tail:\n$tail")
    }

    // 3 writers x 4 appends x 10 rows, nothing lost
    assert(t.toDF.count() === 120)
    assert(t.toDF.groupBy("writer").count().collect()
      .forall(_.getLong(1) === 40))
    val snaps = t.meta.snapshots.sortBy(_.id)
    assert(snaps.size === 12)
    // linear lineage: every snapshot chains to the previous winner
    snaps.sliding(2).foreach {
      case Seq(a, b) => assert(b.parentId.contains(a.id))
      case _ =>
    }
  }
}
