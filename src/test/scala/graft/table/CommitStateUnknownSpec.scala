package graft.table

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkTestBase

/**
 * Commit-state-unknown handling (the Iceberg CommitStateUnknownException
 * contract): a transport failure DURING the claim is ambiguous — the
 * service may have durably recorded the claim before the ack was lost.
 * The guards must re-query and adjudicate instead of reporting a clean
 * failure (which would invite the caller to re-stage and re-commit the
 * same rows: duplicate data).
 */
class CommitStateUnknownSpec extends SparkTestBase {

  private def fsAt(dir: Path): FileSystem =
    dir.getFileSystem(new Configuration())

  private def stage(fs: FileSystem, dir: Path, name: String,
      bytes: Array[Byte]): Path = {
    val p = new Path(dir, name)
    val out = fs.create(p, true); out.write(bytes); out.close(); p
  }

  private def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val b = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(b); b
    } finally in.close()
  }

  /** Test guard exposing the shared adjudication with a scripted state
    * query — pins the trait logic all service guards share. */
  private class ScriptedGuard(query: () => Option[Array[Byte]])
      extends CommitGuard {
    def publish(fs: FileSystem, tmp: Path, target: Path,
        payload: Array[Byte]): Unit =
      adjudicateAmbiguousClaim(fs, tmp, target, payload,
        new java.io.IOException("connection reset mid-claim"), query)
  }

  test("ambiguous claim that LANDED: re-query finds our payload, commit succeeds") {
    val dir = new Path(tmpDir("csu-won"))
    val fs = fsAt(dir); fs.mkdirs(dir)
    val target = new Path(dir, "v00004.metadata.json")
    val mine = """{"w":"me"}""".getBytes(StandardCharsets.UTF_8)
    val guard = new ScriptedGuard(() => Some(mine.clone()))
    guard.publish(fs, stage(fs, dir, "t1", mine), target, mine)
    assert(java.util.Arrays.equals(readAll(fs, target), mine),
      "a landed claim must install and return success")
  }

  test("ambiguous claim LOST to another committer: heal + Concurrent commit") {
    val dir = new Path(tmpDir("csu-lost"))
    val fs = fsAt(dir); fs.mkdirs(dir)
    val target = new Path(dir, "v00004.metadata.json")
    val mine = """{"w":"me"}""".getBytes(StandardCharsets.UTF_8)
    val theirs = """{"w":"them"}""".getBytes(StandardCharsets.UTF_8)
    val guard = new ScriptedGuard(() => Some(theirs.clone()))
    val e = intercept[IllegalStateException] {
      guard.publish(fs, stage(fs, dir, "t1", mine), target, mine)
    }
    assert(e.getMessage.contains("Concurrent commit"))
    assert(java.util.Arrays.equals(readAll(fs, target), theirs),
      "the winner's bytes must be healed into storage")
  }

  test("ambiguous claim that provably NEVER landed: transport error rethrown (retry-safe)") {
    val dir = new Path(tmpDir("csu-clean"))
    val fs = fsAt(dir); fs.mkdirs(dir)
    val target = new Path(dir, "v00004.metadata.json")
    val mine = """{"w":"me"}""".getBytes(StandardCharsets.UTF_8)
    val guard = new ScriptedGuard(() => None)
    val e = intercept[java.io.IOException] {
      guard.publish(fs, stage(fs, dir, "t1", mine), target, mine)
    }
    assert(e.getMessage.contains("connection reset"))
    assert(!fs.exists(target), "nothing may land on a clean failure")
  }

  test("re-query ALSO fails: CommitStateUnknownException, never a clean failure") {
    val dir = new Path(tmpDir("csu-unknown"))
    val fs = fsAt(dir); fs.mkdirs(dir)
    val target = new Path(dir, "v00004.metadata.json")
    val mine = """{"w":"me"}""".getBytes(StandardCharsets.UTF_8)
    val guard = new ScriptedGuard(
      () => throw new java.io.IOException("service unreachable"))
    val e = intercept[CommitStateUnknownException] {
      guard.publish(fs, stage(fs, dir, "t1", mine), target, mine)
    }
    assert(e.getMessage.contains("UNKNOWN"))
    assert(e.getSuppressed.nonEmpty, "the query failure rides as suppressed")
  }

  test("REST end-to-end: server records the claim but drops the response; guard installs anyway") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val slots = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    // claim route: durably records the slot, then ABORTS the connection
    // without any response — the exact lost-ack window
    server.createContext("/v1/commits/claim", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val slot = """"slot"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        val payload = RestCommitGuard.extractPayload(body).getOrElse(Array.empty[Byte])
        slots.putIfAbsent(slot, payload)
        ex.close() // no status line, no body: client sees an IOException
      }
    })
    // state re-query route behaves normally
    server.createContext("/v1/commits/slot", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val slot = """"slot"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        val resp = slots.get(slot) match {
          case null => (404, """{"claimed": false}""")
          case p => (200,
            s"""{"claimed": true, "payload": "${Base64.getEncoder.encodeToString(p)}"}""")
        }
        val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(resp._1, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val dir = new Path(tmpDir("csu-rest"))
      val fs = fsAt(dir); fs.mkdirs(dir)
      val target = new Path(dir, "v00007.metadata.json")
      val mine = """{"rest":"win"}""".getBytes(StandardCharsets.UTF_8)
      new RestCommitGuard(url)
        .publish(fs, stage(fs, dir, "t1", mine), target, mine)
      assert(java.util.Arrays.equals(readAll(fs, target), mine),
        "the recorded-but-unacked claim must be adjudicated as WON")
      assert(slots.size() === 1)
    } finally server.stop(0)
  }
}
