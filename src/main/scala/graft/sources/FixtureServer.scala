package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process HTTP endpoint serving the staged fixture payloads — the
  * live half of the contract's S-family coverage. The zero-egress
  * environment has no external APIs, so the LIVE-fetch connector
  * ([[graft.sources.v2.LiveHttpSource]]) exercises a real HTTP
  * round-trip against this server: real sockets, real auth headers,
  * real query-param pruning (`search`/`limit` are honored server-side,
  * mirroring the reference's `querylog?search={client}&limit=1` —
  * dags/DNS_Requests.py:108).
  *
  * Lifecycle: started lazily on first use, bound to 127.0.0.1:ephemeral,
  * daemon threads only — a JVM running Verify/Bench exits cleanly
  * without explicit shutdown.
  */
object FixtureServer {

  /** Base URL (e.g. `http://127.0.0.1:41234`), starting the server on
    * first access. */
  lazy val base: String = {
    // Thread daemon-ness is inherited: creating the server from a
    // daemon thread makes its internal dispatcher daemon too, so the
    // server never pins the JVM open.
    val holder = new java.util.concurrent.atomic.AtomicReference[String]()
    val starter = new Thread(() => holder.set(start()), "graft-fixture-server-start")
    starter.setDaemon(true)
    starter.start()
    starter.join(10000)
    val b = holder.get()
    require(b != null, "fixture server failed to start within 10 s")
    b
  }

  private def start(): String = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-fixture-server")
      t.setDaemon(true)
      t
    })
    server.setExecutor(pool)
    server.createContext("/querylog", (ex: HttpExchange) =>
      serveJsonl(ex, s"${graft.Tables.FixturesDir}/a2_querylog.jsonl",
        searchField = "client"))
    server.createContext("/status", (ex: HttpExchange) =>
      serveJsonl(ex, s"${graft.Tables.FixturesDir}/a1_status.jsonl",
        searchField = "endpoint"))
    server.createContext("/records", (ex: HttpExchange) =>
      servePaged(ex, s"${graft.Tables.FixturesDir}/a10_paged_records.jsonl"))
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  /** The Basic credentials every route REQUIRES (admin:secret — what
    * the s9 contract query sends). Without enforcement the oracle gate
    * could not detect a connector that silently drops auth headers:
    * an unauthenticated 200 would pass identically. */
  private val RequiredAuth: String = "Basic " +
    java.util.Base64.getEncoder.encodeToString(
      "admin:secret".getBytes(StandardCharsets.UTF_8))

  /** Requests seen per route since JVM start — lets specs assert HOW
    * MANY fetches a page walk issued, not just what rows came back. */
  private val hits = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def countHit(route: String): Unit =
    hits.computeIfAbsent(route, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
  def hitCount(route: String): Long =
    Option(hits.get(route)).map(_.get()).getOrElse(0L)

  /** Serve a fixture JSONL file in fixed-size pages: `page` (1-based)
    * and `per_page` (default 3) slice the file — the Cloudflare-style
    * list pagination the live connector's cursor walk consumes
    * (reference pages `result` arrays the same way:
    * plugins/cloudflare/cloudflare_api.py:120-137). A page past the
    * end returns an empty 200 body, a short last page fewer lines —
    * both termination signals the walk must honor. */
  private def servePaged(ex: HttpExchange, path: String): Unit = {
    try {
      countHit(ex.getRequestURI.getPath)
      if (Option(ex.getRequestHeaders.getFirst("Authorization"))
          .forall(_ != RequiredAuth)) {
        val msg = "unauthorized".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(401, msg.length)
        ex.getResponseBody.write(msg)
        return
      }
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      val page = params.get("page").map(_.toInt).getOrElse(1)
      val per = params.get("per_page").map(_.toInt).getOrElse(3)
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      val from = math.max(0, (page - 1) * per)
      val slice = if (from >= lines.size()) Seq.empty[String]
        else (from until math.min(lines.size(), from + per)).map(lines.get)
      // `include_total=1` opts into the Cloudflare-style result_info
      // envelope (total_pages etc.) as a trailer line on every page —
      // the metadata a cursor walk uses to stop without probing past
      // the end. Opt-in so schema-only consumers never see it.
      val trailer =
        if (params.get("include_total").contains("1")) {
          val totalPages = math.max(1, (lines.size() + per - 1) / per)
          Seq(s"""{"result_info": {"page": $page, "per_page": $per, """ +
            s""""total_pages": $totalPages, "total_count": ${lines.size()}}}""")
        } else Seq.empty[String]
      val bytes = (slice ++ trailer).map(_ + "\n").mkString
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    } catch {
      case e: Exception =>
        val msg = String.valueOf(e.getMessage).getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(500, msg.length)
        ex.getResponseBody.write(msg)
    } finally ex.close()
  }

  /** Serve a fixture JSONL file, honoring `search` (substring match on
    * `searchField`, like AdGuard's querylog search) and `limit` query
    * params — the server-side pruning the connector's pushdown renders. */
  private def serveJsonl(ex: HttpExchange, path: String,
      searchField: String): Unit = {
    try {
      if (Option(ex.getRequestHeaders.getFirst("Authorization"))
          .forall(_ != RequiredAuth)) {
        val msg = "unauthorized".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(401, msg.length)
        ex.getResponseBody.write(msg)
        return
      }
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      val search = params.get("search")
      val limit = params.get("limit").map(_.toInt).getOrElse(Int.MaxValue)
      // Closing quote makes this an exact-value match: without it a
      // client named e.g. "iowa2" would leak into the "iowa" partition.
      val needle = search.map(s => "\"" + searchField + "\": \"" + s + "\"")
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      val body = new StringBuilder
      var n = 0
      lines.forEach { line =>
        if (n < limit && needle.forall(line.contains)) {
          body.append(line).append('\n')
          n += 1
        }
      }
      val bytes = body.toString.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
    } catch {
      case e: Exception =>
        val msg = String.valueOf(e.getMessage).getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(500, msg.length)
        ex.getResponseBody.write(msg)
    } finally ex.close()
  }
}
