package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.ops.{HttpSink, Sinks}
import graft.sources.{Auth, HttpFetch, HttpJsonSource, Sources}

/** End-to-end HTTP coverage against an in-process server: the full
  * fetch → stage → declared-schema read path (S1/S4/V8) and the
  * per-partition POST delivery path (K1–K3). */
class HttpSpec extends SparkSuite {

  private def withServer(routes: Map[String, HttpExchange => Unit])(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => handler(ex))
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fetch -> stage -> declared-schema read, Basic auth header sent") {
    val seenAuth = new java.util.concurrent.atomic.AtomicReference[String]
    val payload =
      """{"endpoint": "adguard-live", "running": true, "protection_enabled": true, "protection_disabled_duration": 0}"""
    withServer(Map("/status" -> { ex =>
      seenAuth.set(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, payload)
    })) { base =>
      val staged = java.nio.file.Files.createTempFile("graft_live", ".jsonl")
      val ok = HttpFetch.fetchToStaging(s"$base/status",
        Auth.Basic("admin", "secret"), staged)
      assert(ok)
      assert(seenAuth.get() == "Basic YWRtaW46c2VjcmV0")
      val df = HttpJsonSource("live", Sources.adguardStatus,
        staged.toString).read(spark)
      val row = df.collect()(0)
      assert(row.getAs[String]("endpoint") == "adguard-live")
      assert(row.getAs[Boolean]("running"))
    }
  }

  test("non-200 fails strict fetch, soft-fails permissive (V8/S4)") {
    withServer(Map("/flaky" -> { ex => respond(ex, 503, "down") })) { base =>
      val staged = java.nio.file.Files.createTempFile("graft_flaky", ".jsonl")
      intercept[java.io.IOException](
        HttpFetch.fetchToStaging(s"$base/flaky", Auth.NoAuth, staged))
      assert(!HttpFetch.fetchToStaging(s"$base/flaky", Auth.NoAuth, staged,
        permissive = true))
    }
  }

  test("HttpSink posts one payload per row to a live endpoint (K2)") {
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    withServer(Map("/patch" -> { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      received.add(body)
      respond(ex, 200, """{"success": true}""")
    })) { base =>
      val url = s"$base/patch"
      HttpSink.send(Sinks.k2PatchPayload(spark, sf), "body") { payload =>
        // executor-side delivery through the same JDK client
        val client = java.net.http.HttpClient.newHttpClient()
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200)
      }
      assert(received.size() == 3)
      assert(received.asScala.forall(_.contains("\"comment\":\"DDNS update\"")))
    }
  }

  test("full monitoring pipeline: fetch -> validate -> alert webhook (D8/K5)") {
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    withServer(Map("/notify" -> { ex =>
      received.add(new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8))
      respond(ex, 200, "ok")
    })) { base =>
      val url = s"$base/notify"
      def webhook(body: String): Unit = {
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      // soft mode: alerts delivered, no throw
      val n = graft.ops.Monitor.dnsPipeline(spark, strict = false)(webhook)
      assert(n == 2 && received.size() == 2)
      assert(received.asScala.exists(_.contains("dns_adguard-3")))
      // strict mode: alerts delivered AND the run fails
      intercept[IllegalStateException](
        graft.ops.Monitor.dnsPipeline(spark, strict = true)(webhook))
    }
  }

  test("insecure fetch trusts a self-signed server; strict fetch refuses it") {
    // Self-signed cert minted for 'localhost' but fetched via
    // 127.0.0.1, so BOTH halves of verify=False are exercised: the
    // untrusted chain AND the hostname mismatch (typical of LAN
    // appliance certs). The strict client must refuse; the insecure
    // client must land the payload anyway.
    val ksDir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ks = ksDir.resolve("ks.p12")
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool",
      "-genkeypair", "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=localhost",
      "-ext", "SAN=DNS:localhost",
      "-keystore", ks.toString, "-storetype", "PKCS12",
      "-storepass", "graftpass").inheritIO().start()
    assert(keytool.waitFor() == 0, "keytool must generate the keystore")

    val kms = javax.net.ssl.KeyManagerFactory.getInstance("SunX509")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(ks)
    try store.load(in, "graftpass".toCharArray) finally in.close()
    kms.init(store, "graftpass".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kms.getKeyManagers, null, null)

    val server = com.sun.net.httpserver.HttpsServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx))
    server.createContext("/status", (ex: HttpExchange) =>
      respond(ex, 200, """{"running": true}"""))
    server.start()
    try {
      val url = s"https://127.0.0.1:${server.getAddress.getPort}/status"
      val dest = ksDir.resolve("staged.json")
      // strict client: self-signed chain is refused (soft-fail observes it)
      assert(!graft.sources.HttpFetch.fetchToStaging(url, Auth.NoAuth, dest,
        permissive = true))
      assert(!java.nio.file.Files.exists(dest))
      // insecure client: verify=False semantics — fetch lands the payload
      assert(graft.sources.HttpFetch.fetchToStaging(url, Auth.NoAuth, dest,
        insecure = true))
      assert(java.nio.file.Files.readString(dest).contains("running"))
    } finally server.stop(0)
  }

  test("recurring-run driver: fixed-rate ticks compose retry + timeout (D4)") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    val outcomes = graft.ops.Flow.runRecurring(
      ticks = 3, periodMs = 120, retries = 2) { tick =>
      // first attempt of every tick fails → withRetry must absorb it
      if (attempts.incrementAndGet() % 2 == 1)
        throw new IllegalStateException(s"transient failure on tick $tick")
      tick
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(outcomes.map(_.get) == Seq(0, 1, 2), "every tick must succeed")
    assert(attempts.get() == 6, "each tick retries exactly once")
    assert(elapsedMs >= 240, s"3 fixed-rate ticks at 120ms span >= 240ms: $elapsedMs")
  }

  test("recurring-run driver executes the monitoring query set per tick") {
    // the reference's cron'd DNS monitoring DAG: each tick runs the
    // fetch -> validate -> alert pipeline; alerts land per tick. The
    // webhook is the observation channel because delivery happens on
    // executors (a driver-side collection would only see a serialized
    // copy of itself).
    val received = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/notify" -> { ex =>
      received.incrementAndGet()
      respond(ex, 200, "ok")
    })) { base =>
      val url = s"$base/notify"
      def webhook(body: String): Unit = {
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val outcomes = graft.ops.Flow.runRecurring(
        ticks = 2, periodMs = 50, retries = 0, timeoutMs = 120000) { _ =>
        graft.ops.Monitor.dnsPipeline(spark, strict = false)(webhook)
      }
      assert(outcomes.forall(_.isSuccess))
      assert(outcomes.map(_.get) == Seq(2L, 2L), "2 violations per tick")
      assert(received.get() == 4, "one alert per violation per tick")
    }
  }

  test("failure-callback listener: failing action fires a rendered webhook alert (K5)") {
    val received = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    withServer(Map("/notify" -> { ex =>
      received.add(new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8))
      respond(ex, 200, "ok")
    })) { base =>
      val url = s"$base/notify"
      def webhook(body: String): Unit = {
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val listener = graft.ops.Alerts.install(spark,
        "The dag {{ dag_id }} failed ({{ name }}): {{ error }}",
        Map("dag_id" -> "dns_monitoring"))(webhook)
      try {
        import spark.implicits._
        val boom = org.apache.spark.sql.functions.udf((i: Long) =>
          if (i >= 0) throw new IllegalStateException("protection disabled")
          else i)
        intercept[Exception] {
          spark.range(4).select(boom($"id")).collect()
        }
        // listener bus delivery is asynchronous — poll for the alert
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (received.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(received.size() >= 1, "expected a delivered failure alert")
        val body = received.asScala.next()
        assert(body.startsWith("The dag dns_monitoring failed"))
        assert(!body.contains("{{")) // every placeholder bound
      } finally graft.ops.Alerts.uninstall(spark, listener)
    }
  }

  test("live-fetch DSv2: partition-per-client fetch, auth + pushdown as query params") {
    // Multi-endpoint live scan: each of the 3 clients must arrive as
    // its own request with the Basic auth header and its search param;
    // a Spark-side filter + limit must be rendered into the URLs.
    val requests = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, String)]() // (query string, auth header)
    val rows = Map(
      "iowa" -> """{"client": "iowa", "oldest": "2024-01-30T22:45:00+00:00"}""",
      "chicago" -> """{"client": "chicago", "oldest": "2024-01-30T20:10:00+00:00"}""",
      "racknerd" -> """{"client": "racknerd", "oldest": "2024-01-30T23:05:30+00:00"}""")
    withServer(Map("/querylog" -> { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      requests.add((q, ex.getRequestHeaders.getFirst("Authorization")))
      val client = q.split("&").collectFirst {
        case kv if kv.startsWith("search=") => kv.stripPrefix("search=")
      }
      respond(ex, 200, client.flatMap(rows.get).getOrElse(""))
    })) { base =>
      val df = spark.read.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/querylog")
        .option("clients", "iowa|chicago|racknerd")
        .option("schemaDDL", "client STRING, oldest STRING")
        .option("authMode", "basic")
        .option("user", "admin").option("secret", "secret")
        .load()
      // full fan-out: 3 partitions, 3 live requests, all authed
      assert(df.rdd.getNumPartitions == 3, "one partition per client")
      assert(df.count() == 3)
      assert(requests.asScala.toSeq.forall(_._2 == "Basic YWRtaW46c2VjcmV0"))
      assert(requests.asScala.toSeq.map(_._1).toSet ==
        Set("search=iowa", "search=chicago", "search=racknerd"))

      // pushdown: EqualTo renders into every endpoint URL
      requests.clear()
      val filtered = df.filter(col("client") === "iowa")
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("pushedFilters=EqualTo(client,iowa)"),
        s"equality must reach the source:\n$plan")
      assert(filtered.collect().map(_.getString(0)).toSeq == Seq("iowa"))
      assert(requests.asScala.toSeq.map(_._1).forall(_.contains("client=iowa")),
        s"params must carry the pushed filter: ${requests.asScala.toSeq}")

      // pushdown: LIMIT renders as the limit= param (a residual Filter
      // node blocks limit pushdown, so it is asserted unfiltered —
      // same contract as the staged connector)
      requests.clear()
      val limited = df.limit(1)
      val lplan = limited.queryExecution.executedPlan.toString
      assert(lplan.contains("pushedLimit=1"), s"limit must reach the source:\n$lplan")
      assert(limited.count() == 1)
      assert(requests.asScala.toSeq.map(_._1).forall(_.contains("limit=1")),
        s"params must carry the pushed limit: ${requests.asScala.toSeq}")
    }
  }

  test("live-fetch DSv2 permissive mode isolates a failed endpoint (S4)") {
    withServer(Map("/querylog" -> { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      if (q.contains("search=down")) respond(ex, 503, "down")
      else respond(ex, 200, """{"client": "up", "oldest": "2024-01-30T22:45:00+00:00"}""")
    })) { base =>
      def read(permissive: Boolean) = spark.read
        .format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/querylog")
        .option("clients", "up|down")
        .option("schemaDDL", "client STRING, oldest STRING")
        .option("permissive", permissive.toString)
        .load()
      // strict: the failing endpoint fails the scan
      intercept[org.apache.spark.SparkException](read(permissive = false).count())
      // permissive: the failing endpoint contributes zero rows
      val got = read(permissive = true).collect().map(_.getString(0)).toSeq
      assert(got == Seq("up"))
    }
  }

  test("live-fetch DSv2 streams: each micro-batch is one poll round per client") {
    // server payload advances per request: distinct polls observe
    // distinct readings — the cron'd monitoring fetch as a stream
    val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/reading" -> { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val client = q.split("&").collectFirst {
        case kv if kv.startsWith("search=") => kv.stripPrefix("search=")
      }.getOrElse("?")
      respond(ex, 200,
        s"""{"client": "$client", "reading": ${seq.incrementAndGet()}}""")
    })) { base =>
      val stream = spark.readStream.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/reading")
        .option("clients", "iowa|chicago")
        .option("schemaDDL", "client STRING, reading BIGINT")
        .load()
      val q = stream.writeStream.format("memory").queryName("graft_live_poll")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
        .start()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (spark.table("graft_live_poll").count() < 6 &&
            System.nanoTime() < deadline)
          Thread.sleep(100)
      } finally q.stop()
      val rows = spark.table("graft_live_poll").collect()
        .map(r => (r.getAs[String]("client"), r.getAs[Long]("reading")))
      assert(rows.length >= 6, s"at least 3 poll rounds x 2 clients: ${rows.toSeq}")
      // every poll hits BOTH clients; readings strictly advance across polls
      assert(rows.map(_._1).count(_ == "iowa") == rows.length / 2)
      assert(rows.map(_._2).distinct.length == rows.length,
        "each fetch observed a fresh server-side reading")
    }
  }

  test("live-fetch stream under Trigger.AvailableNow: exactly one poll round") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/reading" -> { ex =>
      hits.incrementAndGet()
      respond(ex, 200, """{"client": "solo", "reading": 1}""")
    })) { base =>
      val stream = spark.readStream.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/reading")
        .option("clients", "iowa|chicago|racknerd")
        .option("schemaDDL", "client STRING, reading BIGINT")
        .load()
      val q = stream.writeStream.format("memory").queryName("graft_live_now")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.table("graft_live_now").count() == 3,
        "one poll round: one row per client")
      assert(hits.get() == 3, "exactly one fetch per client, then terminate")
    }
  }

  test("live poll rounds feed a watermarked windowed agg end-to-end") {
    // The full production pipeline in one query: the cron'd monitoring
    // fetch (live DSv2 micro-batch source) -> event-time watermark ->
    // tumbling-window aggregation -> Append sink. The server stamps
    // each reading with an advancing event time (+20 s per poll), so
    // the watermark crosses the first window's end after a few polls
    // and Append emits it FINALIZED — asserting the whole chain:
    // live fetch, event-time extraction, state, watermark eviction.
    val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/m" -> { ex =>
      val n = seq.incrementAndGet()
      val ts = java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(20L * n)
      respond(ex, 200, s"""{"client": "solo", "reading": $n, "ts": "$ts"}""")
    })) { base =>
      val windowed = spark.readStream
        .format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/m")
        .option("clients", "solo")
        .option("schemaDDL", "client STRING, reading BIGINT, ts TIMESTAMP")
        .load()
        .withWatermark("ts", "1 second")
        .groupBy(window(col("ts"), "1 minute"), col("client"))
        .agg(count(lit(1)).as("n"), max(col("reading")).as("max_reading"))
        .select(col("window.start").cast("string").as("ws"), col("client"),
          col("n"), col("max_reading"))
      val q = windowed.writeStream.format("memory")
        .queryName("graft_live_windowed")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
        .start()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (spark.table("graft_live_windowed").count() < 1 &&
            System.nanoTime() < deadline)
          Thread.sleep(100)
      } finally q.stop()
      val rows = spark.table("graft_live_windowed").collect()
      assert(rows.nonEmpty, "a finalized window must have been emitted")
      val first = rows.minBy(_.getAs[String]("ws"))
      // window [00:00, 01:00) holds readings 1 (00:00:20) and 2 (00:00:40)
      assert(first.getAs[String]("ws") == "2024-01-01 00:00:00")
      assert(first.getAs[Long]("n") == 2L)
      assert(first.getAs[Long]("max_reading") == 2L)
    }
  }

  test("live-fetch stream resumes from a checkpoint without offset regression") {
    // file sink + checkpoint: stop mid-stream, restart the SAME query
    // from the checkpoint, and the poll counter must fast-forward to
    // the committed offset (a fresh process starts its counter at 0 —
    // without the fast-forward, latestOffset would sit below the
    // restored start and the stream would idle). Server readings only
    // ever advance, so post-restart rows are provably NEW fetches.
    val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer(Map("/r" -> { ex =>
      respond(ex, 200, s"""{"client": "solo", "reading": ${seq.incrementAndGet()}}""")
    })) { base =>
      val ckpt = java.nio.file.Files.createTempDirectory("graft_live_ck").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft_live_o").toString
      def readings(): Seq[Long] =
        spark.read.schema("client STRING, reading BIGINT").json(outDir)
          .collect().map(_.getAs[Long]("reading")).toSeq.sorted
      def start() = spark.readStream.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/r")
        .option("clients", "solo")
        .option("schemaDDL", "client STRING, reading BIGINT")
        .load()
        .writeStream.format("json")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
        .start()
      def awaitRows(atLeast: Int): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (readings().size < atLeast && System.nanoTime() < deadline)
          Thread.sleep(100)
      }
      val q1 = start()
      try awaitRows(2) finally q1.stop()
      val before = readings()
      assert(before.size >= 2, s"first run committed polls: $before")
      val q2 = start()
      try awaitRows(before.size + 2) finally q2.stop()
      val after = readings()
      assert(after.size >= before.size + 2, "stream resumed and kept polling")
      assert(after.distinct.size == after.size,
        s"each committed row is a distinct live fetch: $after")
      assert(after.max > before.max, "post-restart fetches observed fresh state")
    }
  }

  test("fixture endpoint rejects missing auth — the s9 gate really covers auth") {
    val df = spark.read.format("graft.sources.v2.LiveHttpSource")
      .option("url", s"${graft.sources.FixtureServer.base}/querylog")
      .option("clients", "iowa")
      .option("clientParam", "search")
      .option("schemaDDL", "client STRING, oldest STRING")
      .load()
    val e = intercept[Throwable] { df.collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("401")),
      s"unauthenticated fetch must fail with 401: ${chain(e)}")
  }

  test("contract query s9_live_fetch round-trips the fixture endpoint") {
    val out = graft.ops.Semi.s9LiveFetch(spark, sf).collect()
    assert(out.length == 4)
    assert(out.map(_.getString(0)).toSeq ==
      Seq("backup-server", "chicago", "iowa", "racknerd"))
  }

  test("live page-cursor walk fetches every page, stops on the short one") {
    // Counted server: 8 records at per_page=3 → the walk must issue
    // pages 1, 2, 3 (3+3+2 rows) and STOP — the short third page is
    // the termination signal, so no page=4 probe. A single-fetch
    // connector would return 3 rows; a walk ignoring short pages
    // would issue a 4th request.
    val pages = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val recs = (1 to 8).map(i => f"""{"id": "r-$i%02d", "v": $i}""")
    withServer(Map("/paged" -> { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      pages.add(q)
      val page = q.split("&").collectFirst {
        case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
      }.getOrElse(1)
      val slice = recs.slice((page - 1) * 3, page * 3)
      respond(ex, 200, slice.map(_ + "\n").mkString)
    })) { base =>
      val df = spark.read.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/paged")
        .option("schemaDDL", "id STRING, v LONG")
        .option("pageParam", "page")
        .option("pageSizeParam", "per_page").option("pageSize", "3")
        .load()
      val got = df.collect().map(_.getString(0)).sorted
      assert(got.length == 8, s"all pages must be fetched: ${got.toSeq}")
      val pageNums = pages.asScala.toSeq.map(_.split("&").collectFirst {
        case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
      }.getOrElse(-1)).sorted
      assert(pageNums == Seq(1, 2, 3),
        s"walk must stop AT the short page, no page=4 probe: $pageNums")
      assert(pages.asScala.forall(_.contains("per_page=3")),
        s"page size must render as a static param: ${pages.asScala.toSeq}")
    }
  }

  test("permissive page walk is all-or-nothing: a mid-walk failure drops the endpoint") {
    // pages 1-2 succeed, page 3 returns 500: a lazy permissive walk
    // would emit pages 1-2 as a seemingly complete result — partial
    // data masquerading as a full dataset. The S4 contract is
    // per-endpoint isolation, so the endpoint must contribute ZERO
    // rows (and a strict walk must fail the query instead).
    withServer(Map("/paged" -> { ex =>
      val page = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(1)
      if (page >= 3) respond(ex, 500, "boom")
      else respond(ex, 200, s"""{"id": "p$page"}""" + "\n")
    })) { base =>
      def rd(perm: Boolean) = spark.read
        .format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/paged")
        .option("schemaDDL", "id STRING")
        .option("pageParam", "page")
        .option("permissive", perm.toString)
        .load()
      assert(rd(perm = true).count() == 0,
        "mid-walk failure must drop the WHOLE endpoint, not truncate")
      val e = intercept[Throwable] { rd(perm = false).count() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
      assert(chain(e).exists(_.contains("500")), s"strict walk must surface the 500: ${chain(e)}")
    }
  }

  test("permissive page walk spools to disk: bounded heap, cleaned up after") {
    // 400 pages × 50 rows stream through a spool file on executor-local
    // disk — the pre-r9 walk buffered all of it in task heap before
    // emitting a row. Evidence: the spool counters record one file of
    // the full payload size, and no graft_live_spool file survives
    // consumption (the all-or-nothing contract is upheld by the
    // companion mid-walk-failure test above).
    val nPages = 400; val perPage = 50
    withServer(Map("/paged" -> { ex =>
      val page = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(1)
      val body =
        if (page > nPages) ""
        else (1 to perPage)
          .map(i => s"""{"id": "p$page-r$i", "v": ${page * 1000 + i}}""" + "\n")
          .mkString
      respond(ex, 200, body)
    })) { base =>
      val files0 = graft.sources.v2.LiveHttpReader.spooledFiles.get()
      val bytes0 = graft.sources.v2.LiveHttpReader.spooledBytes.get()
      val df = spark.read.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/paged")
        .option("schemaDDL", "id STRING, v LONG")
        .option("pageParam", "page")
        .option("permissive", "true")
        .load()
      assert(df.count() == nPages.toLong * perPage)
      assert(graft.sources.v2.LiveHttpReader.spooledFiles.get() > files0,
        "permissive paged walk must take the disk-spool path")
      val spooled = graft.sources.v2.LiveHttpReader.spooledBytes.get() - bytes0
      assert(spooled > nPages.toLong * perPage * 20,
        s"spool must carry the full payload, got $spooled bytes")
      val leftovers = new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles((_, n) => n.startsWith("graft_live_spool"))
      assert(leftovers == null || leftovers.isEmpty,
        s"spool files must be deleted on exhaustion: ${leftovers.toSeq}")
    }
  }

  test("short-page stop is armed only when the size was sent to the server") {
    // pageSize set WITHOUT pageSizeParam: the server never saw the
    // size, so a 2-line default page must NOT read as "short" — the
    // walk continues to the empty page.
    withServer(Map("/paged" -> { ex =>
      val page = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(1)
      val body = if (page <= 2)
        s"""{"id": "p$page-a"}""" + "\n" + s"""{"id": "p$page-b"}""" + "\n"
        else ""
      respond(ex, 200, body)
    })) { base =>
      val df = spark.read.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/paged")
        .option("schemaDDL", "id STRING")
        .option("pageParam", "page")
        .option("pageSize", "3") // NOT communicated: no pageSizeParam
        .load()
      assert(df.count() == 4, "uncommunicated pageSize must not truncate the walk")
    }
  }

  test("page walk terminates on an EMPTY page when sizes are unknown") {
    // No pageSize configured: the only termination signal is the empty
    // page — exactly one extra probe past the end, never a runaway.
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    withServer(Map("/paged" -> { ex =>
      val page = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(1)
      seen.add(page)
      val body = if (page <= 2) s"""{"id": "p$page"}""" + "\n" else ""
      respond(ex, 200, body)
    })) { base =>
      val df = spark.read.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/paged")
        .option("schemaDDL", "id STRING")
        .option("pageParam", "page")
        .load()
      assert(df.count() == 2)
      assert(seen.asScala.toSeq.sorted == Seq(1, 2, 3),
        s"one empty probe terminates the walk: ${seen.asScala.toSeq.sorted}")
    }
  }

  test("metadata total_pages stops the walk without probing past the end") {
    // 4 FULL pages of 2 rows, each carrying a Cloudflare-style
    // result_info trailer (plugins/cloudflare/cloudflare_api.py's
    // response shape). With totalPagesField armed the walk must fetch
    // exactly pages 1-4 — the declared count replaces the empty page-5
    // probe that full-last-page termination otherwise costs — and the
    // metadata line must never surface as a row.
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    withServer(Map("/paged" -> { ex =>
      val page = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(1)
      seen.add(page)
      val rows = if (page <= 4)
        Seq(s"""{"id": "p$page-a"}""", s"""{"id": "p$page-b"}""")
      else Seq.empty[String]
      val meta = s"""{"result_info": {"page": $page, "total_pages": 4}}"""
      respond(ex, 200, (rows :+ meta).map(_ + "\n").mkString)
    })) { base =>
      val df = spark.read.format("graft.sources.v2.LiveHttpSource")
        .option("url", s"$base/paged")
        .option("schemaDDL", "id STRING")
        .option("pageParam", "page")
        .option("totalPagesField", "result_info.total_pages")
        .load()
      val ids = df.collect().map(_.getString(0))
      assert(ids.length == 8 && !ids.contains(null),
        s"metadata line must not become a row: ${ids.toSeq}")
      assert(seen.asScala.toSeq.sorted == Seq(1, 2, 3, 4),
        s"declared total_pages must stop the walk at page 4: ${seen.asScala.toSeq.sorted}")
    }
  }

  test("fixture server result_info envelope drives a single-fetch-exact walk") {
    // /records?include_total=1 with per_page covering the whole file:
    // the armed walk learns total_pages=1 from the first response and
    // issues exactly ONE fetch — no page-2 probe.
    val before = graft.sources.FixtureServer.hitCount("/records")
    val df = spark.read.format("graft.sources.v2.LiveHttpSource")
      .option("url", s"${graft.sources.FixtureServer.base}/records?include_total=1")
      .option("schemaDDL", "id STRING, name STRING, type STRING, content STRING")
      .option("authMode", "basic").option("user", "admin")
      .option("secret", "secret")
      .option("pageParam", "page")
      .option("pageSizeParam", "per_page").option("pageSize", "7")
      .option("totalPagesField", "result_info.total_pages")
      .load()
    assert(df.count() == 7)
    val fetched = graft.sources.FixtureServer.hitCount("/records") - before
    assert(fetched == 1,
      s"declared single page must cost exactly one fetch, got $fetched")
  }

  test("contract query s11_live_paginated walks the fixture's three pages") {
    val before = graft.sources.FixtureServer.hitCount("/records")
    val out = graft.ops.Semi.s11LivePaginated(spark, sf).collect()
    assert(out.length == 7)
    assert(out.map(_.getString(0)).toSeq == (1 to 7).map(i => f"rec-$i%02d"))
    // At least one full 3-page walk happened (a single-fetch connector
    // would need only 1 request per scan pass). The exact per-walk
    // page sequence — stop AT the short page, no page=4 probe — is
    // pinned by the withServer tests above; asserting a multiple here
    // would couple the contract to Spark's internal scan-pass count
    // (retries, AQE, RangePartitioner sampling all change it).
    val fetched = graft.sources.FixtureServer.hitCount("/records") - before
    assert(fetched >= 3, s"a full page walk needs >= 3 fetches, got $fetched")
  }

  test("alert delivery retries a flaky webhook; exhausted retries dead-letter") {
    // server fails the first 2 attempts per body then succeeds — one
    // redelivery cycle inside the listener's retry budget (the
    // reference's `retries: 2` notifier policy). A second listener
    // posting to an always-down route must land its body in the DLQ.
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val deliveredBodies = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    withServer(Map(
      "/flaky" -> { ex =>
        val n = attempts.incrementAndGet()
        if (n <= 2) respond(ex, 503, "down")
        else {
          deliveredBodies.add(new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8))
          respond(ex, 200, "ok")
        }
      },
      "/dead" -> { ex => respond(ex, 503, "permanently down") })) { base =>
      def webhook(route: String)(body: String): Unit = {
        val client = java.net.http.HttpClient.newHttpClient()
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"$base$route"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() != 200)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()}")
      }
      val flaky = graft.ops.Alerts.install(spark,
        "alert: {{ name }}", deliveryRetries = 2)(webhook("/flaky"))
      val dead = graft.ops.Alerts.install(spark,
        "dead: {{ name }}", deliveryRetries = 1)(webhook("/dead"))
      try {
        import spark.implicits._
        val boom = org.apache.spark.sql.functions.udf((i: Long) =>
          if (i >= 0) throw new IllegalStateException("boom") else i)
        intercept[Exception] {
          spark.range(4).select(boom($"id")).collect()
        }
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while ((deliveredBodies.isEmpty || dead.deadLetters.isEmpty) &&
            System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(attempts.get() == 3, "2 refused attempts + 1 delivered")
        assert(deliveredBodies.asScala.toSeq.exists(_.startsWith("alert:")),
          "flaky route delivers after redelivery")
        assert(flaky.deadLetters.isEmpty, "delivered bodies never dead-letter")
        assert(dead.deadLetters.size() == 1 &&
          dead.deadLetters.peek().startsWith("dead:"),
          "always-down route dead-letters the body after exhausting retries")
      } finally {
        graft.ops.Alerts.uninstall(spark, flaky)
        graft.ops.Alerts.uninstall(spark, dead)
      }
    }
  }

  private implicit class SetOps[T](s: java.util.Set[T]) {
    def asScala: Iterator[T] = {
      val it = s.iterator(); new Iterator[T] {
        def hasNext: Boolean = it.hasNext
        def next(): T = it.next()
      }
    }
  }
}
