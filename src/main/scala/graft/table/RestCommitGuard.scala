package graft.table

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * REST catalog-service commit CAS — the HTTP twin of [[JdbcCommitGuard]]
 * and the shape of the reference's REST-catalog mode
 * (IcebergSupport.scala:26-30, selected when `CATALOG_URL` starts with
 * `http`): the catalog service adjudicates every version-slot claim, so
 * commits are multi-process-atomic on ANY storage, object stores
 * included. Protocol (see [[RestCatalogServer]] for the reference
 * service):
 *
 *  - `POST {url}/v1/commits/claim` with `{"slot": s, "payload": b64}` —
 *    the service performs an atomic put-if-absent. `200` = this committer
 *    won; `409` = slot taken (response carries the winner's payload so
 *    losers can heal storage).
 *  - The winner then installs the bytes at the target path — uncontended
 *    (the slot owner is unique) and idempotent; a loser that finds the
 *    target missing (winner died between claim and install) re-creates
 *    it from the 409 response's service copy, exactly the
 *    [[JdbcCommitGuard]] crash-heal.
 *
 * Uses the JDK `HttpClient` only — no added dependencies. Commits are
 * rare, short requests; per-publish client construction is fine.
 */
final class RestCommitGuard(url: String) extends CommitGuard {

  private def client: HttpClient = HttpClient.newHttpClient()

  def publish(fs: FileSystem, tmp: Path, target: Path, payload: Array[Byte]): Unit = {
    val slot = fs.makeQualified(target).toUri.toString
    val body =
      s"""{"slot": ${RestCommitGuard.quote(slot)}, "payload": "${Base64.getEncoder.encodeToString(payload)}"}"""
    val req = HttpRequest.newBuilder(URI.create(s"$url/v1/commits/claim"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        // transport failure AFTER the request may have reached the
        // service: the claim state is ambiguous — re-query and
        // adjudicate instead of reporting a clean failure (which would
        // invite a duplicate-data re-commit)
        case e @ (_: java.io.IOException | _: InterruptedException) =>
          if (e.isInstanceOf[InterruptedException])
            Thread.currentThread().interrupt()
          adjudicateAmbiguousClaim(fs, tmp, target, payload, e,
            () => querySlot(slot))
          return
      }
    resp.statusCode() match {
      case 200 =>
        CommitGuard.maybeCrashAfterClaim()
        installOwned(fs, tmp, target)
      case 409 =>
        fs.delete(tmp, false)
        if (!fs.exists(target)) {
          // heal from the service's copy of the WINNER's bytes
          RestCommitGuard.extractPayload(resp.body()).foreach { winner =>
            installBytes(fs, target, winner)
          }
        }
        lost(target)
      case other => throw new IllegalStateException(
        s"catalog service $url returned HTTP $other for $slot: ${resp.body()}")
    }
  }

  /** State re-query for the ambiguous-claim path: `POST /v1/commits/slot`
    * returns 200 + the recorded payload, or 404 when the slot is free. */
  private def querySlot(slot: String): Option[Array[Byte]] = {
    val req = HttpRequest.newBuilder(URI.create(s"$url/v1/commits/slot"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"""{"slot": ${RestCommitGuard.quote(slot)}}""", StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => RestCommitGuard.extractPayload(resp.body())
      case 404 => None
      case other => throw new IllegalStateException(
        s"catalog service $url returned HTTP $other for slot query $slot")
    }
  }
}

object RestCommitGuard {

  /** Route EVERY table commit in this JVM through the REST catalog at
    * `url`; returns the previous selector for restore. */
  def installGlobally(url: String): (FileSystem, Path) => CommitGuard = {
    val previous = SnapshotLog.commitGuardFor
    val guard = new RestCommitGuard(url)
    SnapshotLog.commitGuardFor = (_, _) => guard
    previous
  }

  private[table] def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Pull the base64 `payload` field out of a service response (the only
    * JSON this protocol carries back). */
  private[table] def extractPayload(json: String): Option[Array[Byte]] = {
    val m = """"payload"\s*:\s*"([A-Za-z0-9+/=]*)"""".r
    m.findFirstMatchIn(json).map(g => Base64.getDecoder.decode(g.group(1)))
  }
}

/**
 * Minimal reference catalog service for [[RestCommitGuard]] — a JDK
 * `com.sun.net.httpserver` endpoint holding the slot map with atomic
 * put-if-absent. In production the same two-route protocol fronts a
 * durable store (the JDBC table of [[JdbcCommitGuard]], or any KV with
 * conditional put); this in-memory server is the self-contained harness
 * for racing REAL separate JVMs through an HTTP CAS (see
 * RestCommitGuardSpec) — the process-boundary test the embedded-only
 * Derby sandbox cannot run.
 */
final class RestCatalogServer {

  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  private val slots = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private var server: HttpServer = _

  /** Starts on an ephemeral port; returns the base url. */
  def start(): String = {
    server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/v1/commits/claim", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val slot = """"slot"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        val payload = RestCommitGuard.extractPayload(body).getOrElse(Array.empty[Byte])
        val prior = slots.putIfAbsent(slot, payload)
        if (prior == null) respond(ex, 200, """{"claimed": true}""")
        else respond(ex, 409,
          s"""{"claimed": false, "payload": "${Base64.getEncoder.encodeToString(prior)}"}""")
      }
    })
    // commit-state re-query (the ambiguous-claim adjudication route):
    // 200 + recorded payload when the slot is taken, 404 when free
    server.createContext("/v1/commits/slot", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val slot = """"slot"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        slots.get(slot) match {
          case null => respond(ex, 404, """{"claimed": false}""")
          case prior => respond(ex, 200,
            s"""{"claimed": true, "payload": "${Base64.getEncoder.encodeToString(prior)}"}""")
        }
      }
    })
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = if (server != null) server.stop(0)

  def claimedSlots: Int = slots.size()

  /** The claimed slot keys (qualified target paths) — lets a fuzz
    * campaign assert every recorded claim ended up installed/healed. */
  def slotKeys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    slots.keySet().asScala.toSeq
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
