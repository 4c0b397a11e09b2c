package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Util._
import graft.sources.Sources

/** Semi-structured operators over declared-schema JSON payloads
  * (SURVEY.md §2.2 P1–P10, §2.1 S1–S5 read shapes).
  *
  * Oracles are DuckDB VALUES literals of the same staged fixture rows
  * (under the fixtures dir) with the same transformation applied — the
  * transformation logic is what's being cross-checked; JSON decoding
  * itself is covered by the declared-schema read path.
  */
object Semi {

  /** VALUES clause for fixtures/a7_ips.json. */
  private val a7Values =
    """(VALUES
        ('racknerd', '203.0.113.7', CAST(NULL AS VARCHAR)),
        ('iowa', '198.51.100.22', '2001:db8::22'),
        ('chicago', '192.0.2.40', '2001:db8::40'),
        ('unknown', '192.0.2.9', CAST(NULL AS VARCHAR)))
       AS t(id, ipv4_address, ipv6_address)"""

  // P1 — equality filter → scalar extract with try_cast default
  // (dags/Speedtest.py:73-89): "unavailable" state falls back to 0.0.
  def p1TrycastExtract(spark: SparkSession, sfDir: String): DataFrame =
    Sources.haStatesSrc(spark)
      .filter(col("entity_id").isin(
        "sensor.speedtest_upload", "sensor.speedtest_download"))
      .select(col("entity_id"),
        coalesce(expr("try_cast(state AS DOUBLE)"), lit(0.0)).as("mbps"))
      .orderBy(col("entity_id"))
  val p1Sql: String =
    """SELECT entity_id, coalesce(TRY_CAST(state AS DOUBLE), 0.0) AS mbps
       FROM (VALUES
         ('sensor.speedtest_upload', '42.3'),
         ('sensor.speedtest_download', 'unavailable'),
         ('sensor.other', 'on'),
         ('sensor.speedtest_ping', '17.95')) AS t(entity_id, state)
       WHERE entity_id IN ('sensor.speedtest_upload', 'sensor.speedtest_download')
       ORDER BY entity_id"""

  // P2 — equality filter → id lookup (cloudflare_api.py:22-26); empty
  // result is the V-side error (assertEmpty on the negation).
  def p2IdLookup(spark: SparkSession, sfDir: String): DataFrame =
    Sources.zonesSrc(spark)
      .filter(col("name") === "example.com")
      .select(col("id"))
  val p2Sql: String =
    """SELECT id FROM (VALUES
        ('example.com', 'zone-001'), ('example.org', 'zone-002'),
        ('example.net', 'zone-003')) AS t(name, id)
       WHERE name = 'example.com'"""

  // P3 — type filter → projection (cloudflare_api.py:45-55).
  def p3TypeFilter(spark: SparkSession, sfDir: String): DataFrame =
    Sources.dnsRecordsSrc(spark)
      .filter(col("type") === "A")
      .select(col("content"))
      .orderBy(col("content"))
  val p3Sql: String =
    """SELECT content FROM (VALUES
        ('vpn.example.com', 'A', '203.0.113.7'),
        ('vpn.example.com', 'AAAA', '2001:db8::7'),
        ('home.example.com', 'A', '198.51.100.22'),
        ('cdn.example.com', 'CNAME', 'edge.example.net'),
        ('mail.example.com', 'A', '192.0.2.40')) AS t(name, type, content)
       WHERE type = 'A' ORDER BY content"""

  // P4 — compound predicate: equi + flag-dependent type
  // (cloudflare_api.py:69-77), here with ipv6 = true.
  def p4CompoundFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val ipv6 = true
    Sources.dnsRecordsSrc(spark)
      .filter(col("name") === "vpn.example.com" &&
        col("type") === lit(if (ipv6) "AAAA" else "A"))
      .select(col("id"))
  }
  val p4Sql: String =
    """SELECT id FROM (VALUES
        ('vpn.example.com', 'A', 'rec-01'), ('vpn.example.com', 'AAAA', 'rec-02'),
        ('home.example.com', 'A', 'rec-03'), ('cdn.example.com', 'CNAME', 'rec-04'),
        ('mail.example.com', 'A', 'rec-05')) AS t(name, type, id)
       WHERE name = 'vpn.example.com' AND type = 'AAAA'"""

  // P5 — case-insensitive substring filter → first match
  // (cloudflare_api.py:131-137). limit(1) after a total-order sort.
  def p5CiSubstring(spark: SparkSession, sfDir: String): DataFrame =
    Sources.policiesSrc(spark)
      .filter(lower(col("name")).contains(lower(lit("ALLOW"))))
      .select(col("id"), col("name"))
      .orderBy(col("id"))
      .limit(1)
  val p5Sql: String =
    """SELECT id, name FROM (VALUES
        ('Allow Home IPs', 'pol-01'), ('Deny All', 'pol-02'),
        ('allow office ips', 'pol-03')) AS t(name, id)
       WHERE contains(lower(name), lower('ALLOW')) ORDER BY id LIMIT 1"""

  // P6 — existence/non-null projections → union
  // (dags/Cloudflare_Apps.py:134-136).
  def p6UnionNonnull(spark: SparkSession, sfDir: String): DataFrame = {
    val ips = Sources.ipInventorySrc(spark)
    ips.filter(col("ipv4_address").isNotNull)
      .select(col("ipv4_address").as("ip"))
      .unionByName(ips.filter(col("ipv6_address").isNotNull)
        .select(col("ipv6_address").as("ip")))
      .orderBy(col("ip"))
  }
  val p6Sql: String =
    s"""SELECT ipv4_address AS ip FROM $a7Values WHERE ipv4_address IS NOT NULL
       UNION ALL
       SELECT ipv6_address AS ip FROM $a7Values WHERE ipv6_address IS NOT NULL
       ORDER BY ip"""

  // P7 — switch/case value mapping (dags/Cloudflare_Apps.py:79-87).
  def p7CaseMap(spark: SparkSession, sfDir: String): DataFrame =
    Sources.ipInventorySrc(spark)
      .select(col("id"),
        when(col("id") === "racknerd", "vpn.example.com")
          .when(col("id") === "iowa", "home.example.com")
          .when(col("id") === "chicago", "office.example.com")
          .otherwise(lit(null)).as("hostname"))
      .orderBy(col("id"))
  val p7Sql: String =
    s"""SELECT id, CASE id WHEN 'racknerd' THEN 'vpn.example.com'
         WHEN 'iowa' THEN 'home.example.com'
         WHEN 'chicago' THEN 'office.example.com'
         ELSE NULL END AS hostname
       FROM $a7Values ORDER BY id"""

  // P8 — key-presence / schema-validation predicate
  // (dags/DNS_Requests.py:63-75): per declared required field, the
  // count of rows missing it ("version" is absent from the payload,
  // exercising the violation path).
  def p8ShapeCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val schemaPlus = graft.sources.Sources.adguardStatus
      .add("version", org.apache.spark.sql.types.StringType)
    val src = spark.read.schema(schemaPlus)
      .json(s"${graft.Tables.FixturesDir}/a1_status.jsonl")
    val fields = Seq("endpoint", "running", "protection_enabled",
      "protection_disabled_duration", "version")
    val counts = src.agg(
      count(lit(1)).as("_n"),
      fields.map(f => count(col(f)).as(f)): _*)
    val stackExpr = fields.map(f => s"'$f', _n - $f").mkString(", ")
    counts.select(expr(
      s"stack(${fields.size}, $stackExpr) AS (field, n_missing)"))
      .orderBy(col("field"))
  }
  val p8Sql: String =
    """WITH src AS (SELECT *, CAST(NULL AS VARCHAR) AS version FROM (VALUES
        ('adguard-1', true, true, 0), ('adguard-2', true, false, 300),
        ('adguard-3', false, true, 0), ('adguard-4', true, false, 0))
       AS t(endpoint, running, protection_enabled, protection_disabled_duration))
       SELECT field, n_missing FROM (
         SELECT 'endpoint' AS field, count(1) - count(endpoint) AS n_missing FROM src
         UNION ALL SELECT 'running', count(1) - count(running) FROM src
         UNION ALL SELECT 'protection_enabled', count(1) - count(protection_enabled) FROM src
         UNION ALL SELECT 'protection_disabled_duration', count(1) - count(protection_disabled_duration) FROM src
         UNION ALL SELECT 'version', count(1) - count(version) FROM src)
       ORDER BY field"""

  // P9 — exact-document equality predicate (dags/Backups.py:63).
  def p9DocEquality(spark: SparkSession, sfDir: String): DataFrame =
    Sources.healthSrc(spark)
      .filter(col("status") =!= "OK")
      .orderBy(col("device"))
  val p9Sql: String =
    """SELECT device, status FROM (VALUES
        ('iowa', 'OK'), ('chicago', 'OK'), ('backup-server', 'DEGRADED'))
       AS t(device, status) WHERE status <> 'OK' ORDER BY device"""

  // P10 — map explode → per-entry temporal predicate
  // (dags/Backups.py:132-139): folder stats keyed by folder id; stale
  // when lastScan < now − 2h (now = 2024-01-31 00:00:00).
  def p10MapExplode(spark: SparkSession, sfDir: String): DataFrame =
    Sources.folderStatsSrc(spark)
      .select(col("device"), explode(col("folders")).as(Seq("folder_id", "stats")))
      .select(col("device"), col("folder_id"),
        col("stats.lastScan").as("last_scan"),
        (col("stats.lastScan").cast("timestamp") <
          lit("2024-01-30 22:00:00").cast("timestamp")).as("stale"))
      .orderBy(col("device"), col("folder_id"))
  // NOTE: DuckDB 1.0.0 unsafely rewrites `CAST(varchar AS TIMESTAMP) <
  // TIMESTAMP '...'` into a raw VARCHAR compare (breaks on the 'T'
  // separator); going through epoch() blocks that rewrite.
  val p10Sql: String =
    """SELECT device, folder_id, last_scan,
       epoch(CAST(last_scan AS TIMESTAMP)) < epoch(TIMESTAMP '2024-01-30 22:00:00') AS stale
       FROM (VALUES
        ('iowa', 'abcd-1234', '2024-01-30T23:00:00+00:00'),
        ('iowa', 'efgh-5678', '2024-01-30T21:30:00+00:00'),
        ('chicago', 'abcd-1234', '2024-01-28T00:00:00+00:00'),
        ('backup-server', 'mnop-9999', '2024-01-30T22:59:59+00:00'),
        ('backup-server', 'qrst-0000', '2024-01-15T12:00:00+00:00'))
       AS t(device, folder_id, last_scan)
       ORDER BY device, folder_id"""

  // F3 — URL/key construction by string interpolation
  // (dags/Backups.py:55-58).
  def f3Concat(spark: SparkSession, sfDir: String): DataFrame =
    Sources.foldersSrc(spark)
      .select(col("device")).distinct()
      .select(col("device"),
        format_string("https://%s.example.com:8443/rest", col("device"))
          .as("url"),
        concat(lit("BACKUP_"), upper(col("device")), lit("_HOST")).as("var_key"))
      .orderBy(col("device"))
  val f3Sql: String =
    """SELECT device,
       'https://' || device || '.example.com:8443/rest' AS url,
       'BACKUP_' || upper(device) || '_HOST' AS var_key
       FROM (SELECT DISTINCT device FROM (VALUES
        ('iowa'), ('iowa'), ('chicago'), ('backup-server')) AS t(device))
       ORDER BY device"""

  // F5 — ISO-8601 parse → epoch seconds (dags/DNS_Requests.py:129).
  def f5IsoParse(spark: SparkSession, sfDir: String): DataFrame =
    Sources.querylogSrc(spark)
      .select(col("client"),
        unix_timestamp(to_timestamp(col("oldest"))).as("oldest_epoch"))
      .orderBy(col("client"))
  val f5Sql: String =
    """SELECT client,
       CAST(epoch(CAST(oldest AS TIMESTAMPTZ)) AS BIGINT) AS oldest_epoch
       FROM (VALUES
        ('iowa', '2024-01-30T22:45:00.000000+00:00'),
        ('chicago', '2024-01-30T20:10:00.000000+00:00'),
        ('racknerd', '2024-01-30T23:05:30.500000+00:00'),
        ('backup-server', '2024-01-29T04:00:00.000000+00:00'))
       AS t(client, oldest) ORDER BY client"""

  // S1 — declared-schema staged read, Basic auth config (full rows).
  def s1StagedRead(spark: SparkSession, sfDir: String): DataFrame =
    Sources.adguardStatusSrc(spark).orderBy(col("endpoint"))
  val s1Sql: String =
    """SELECT endpoint, running, protection_enabled, protection_disabled_duration
       FROM (VALUES
        ('adguard-1', true, true, 0), ('adguard-2', true, false, 300),
        ('adguard-3', false, true, 0), ('adguard-4', true, false, 0))
       AS t(endpoint, running, protection_enabled, protection_disabled_duration)
       ORDER BY endpoint"""

  // S4 — permissive soft-fail read of an unparseable payload
  // (dags/Cloudflare_DDNS.py:41-49): one row, fields null, fetch_ok
  // false — the `return None` lift.
  def s4SoftFail(spark: SparkSession, sfDir: String): DataFrame =
    Sources.ipifyPermissiveSrc(spark)
      .select(col("ip"), col("fetch_ok"))
  val s4Sql: String =
    """SELECT CAST(NULL AS VARCHAR) AS ip, false AS fetch_ok"""

  // S2 — DataSource V2 staged-HTTP read with filter pushdown: the
  // equality predicate reaches the source itself (the Spark lift of
  // `querylog?search={client}` — dags/DNS_Requests.py:108).
  def s2Dsv2Pushdown(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.v2.StagedHttpSource")
      .option("path", s"${graft.Tables.FixturesDir}/a2_querylog.jsonl")
      .option("schemaDDL", "client STRING, oldest STRING")
      .load()
      .filter(col("client") === "iowa")
      .select(col("client"), col("oldest"))
  val s2Sql: String =
    """SELECT client, oldest FROM (VALUES
        ('iowa', '2024-01-30T22:45:00.000000+00:00'),
        ('chicago', '2024-01-30T20:10:00.000000+00:00'),
        ('racknerd', '2024-01-30T23:05:30.500000+00:00'),
        ('backup-server', '2024-01-29T04:00:00.000000+00:00'))
       AS t(client, oldest) WHERE client = 'iowa'"""

  // S9 — LIVE-fetch DataSource V2 read: one input partition per
  // client, each executing a real HTTP GET (executor-side, JDK
  // transport) against the in-process fixture endpoint, with the
  // client rendered as the `search` query param — the reference's
  // `.expand(client=clients)` fan-out over `querylog?search={client}`
  // (dags/DNS_Requests.py:108,139) as a Spark scan. The server prunes
  // on the param, so each partition transfers exactly its client's
  // rows.
  def s9LiveFetch(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.v2.LiveHttpSource")
      .option("url", s"${graft.sources.FixtureServer.base}/querylog")
      .option("clients", "iowa|chicago|racknerd|backup-server")
      .option("clientParam", "search")
      .option("schemaDDL", "client STRING, oldest STRING")
      .option("authMode", "basic")
      .option("user", "admin").option("secret", "secret")
      .load()
      .orderBy(col("client"))
  val s9Sql: String =
    """SELECT client, oldest FROM (VALUES
        ('iowa', '2024-01-30T22:45:00.000000+00:00'),
        ('chicago', '2024-01-30T20:10:00.000000+00:00'),
        ('racknerd', '2024-01-30T23:05:30.500000+00:00'),
        ('backup-server', '2024-01-29T04:00:00.000000+00:00'))
       AS t(client, oldest) ORDER BY client"""

  // S11 — LIVE paginated fetch: the executor-side page-cursor walk
  // over a list endpoint (`?page=N`, stop on empty/short page) — the
  // live half of the reference's Cloudflare result paging
  // (plugins/cloudflare/cloudflare_api.py:11-30,120-137). The fixture
  // endpoint serves 7 records at per_page=3, so a correct walk issues
  // pages 1..3 and stops on the short third page; a round-6-shaped
  // connector (single fetch) would return only page 1's 3 rows and
  // break the row count, order, and hash.
  def s11LivePaginated(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.v2.LiveHttpSource")
      .option("url", s"${graft.sources.FixtureServer.base}/records")
      .option("schemaDDL", "id STRING, name STRING, type STRING, content STRING")
      .option("authMode", "basic")
      .option("user", "admin").option("secret", "secret")
      .option("pageParam", "page")
      .option("pageSizeParam", "per_page").option("pageSize", "3")
      .load()
      .orderBy(col("id"))
  val s11Sql: String =
    """SELECT id, name, type, content FROM (VALUES
        ('rec-01', 'vpn.example.com', 'A', '203.0.113.7'),
        ('rec-02', 'vpn.example.com', 'AAAA', '2001:db8::7'),
        ('rec-03', 'home.example.com', 'A', '198.51.100.22'),
        ('rec-04', 'cdn.example.com', 'CNAME', 'edge.example.net'),
        ('rec-05', 'mail.example.com', 'A', '192.0.2.40'),
        ('rec-06', 'www.example.com', 'CNAME', 'apex.example.com'),
        ('rec-07', 'api.example.com', 'A', '203.0.113.99'))
       AS t(id, name, type, content) ORDER BY id"""

  // S12 — engine health probe: one row per component with a bounded
  // probe result and a healthy verdict — the queryable analog of the
  // reference's healthcheck endpoint walk (config/healthcheck.sh:20-41
  // checks metadatabase/scheduler/triggerer statuses; here the
  // components are the warehouse tables, the live HTTP boundary, and
  // the session). Table probes are LIMIT-1 reads — "readable and
  // non-empty" at metadata cost, never a full count, so the probe
  // itself is 100 TB-safe. The 12-row collect is the health report,
  // bounded by the component inventory.
  def s12HealthProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // All table probes fuse into ONE union plan (one Spark job), not
    // one job per table. A missing/unreadable table fails at PLAN time
    // (spark.read.parquet analyzes eagerly) and is caught per table;
    // an empty table probes 0. The case this trades away — a file
    // vanishing between plan and execute — fails the query loudly
    // instead of flagging one row, an acceptable trade for 11× fewer
    // job launches in the report.
    val tableRows = graft.Tables.Names.map { t =>
      val probe =
        try {
          val df = if (t == "events") graft.Tables.events(spark, sfDir)
            else graft.Tables.table(spark, sfDir, t)
          df.limit(1).select(lit(1L).as("one"))
            .agg(coalesce(sum(col("one")), lit(0L)).as("probe"))
        } catch { case _: Exception =>
          spark.range(1).select(lit(0L).as("probe"))
        }
      probe.select(lit(s"table:$t").as("component"), col("probe"),
        (col("probe") > 0L).as("healthy"))
    }
    val http =
      try {
        val auth = "Basic " + java.util.Base64.getEncoder.encodeToString(
          "admin:secret".getBytes("UTF-8"))
        graft.sources.v2.JdkTransport.fetch(
          s"${graft.sources.FixtureServer.base}/status?limit=1",
          Map("Authorization" -> auth), 5000L)
        ("http:fixture", 1L, true)
      } catch { case _: Exception => ("http:fixture", 0L, false) }
    val session =
      if (spark.sparkContext.isStopped) ("session", 0L, false)
      else ("session", 1L, true)
    // Streaming machinery rows — the scheduler/triggerer half of the
    // reference's healthcheck (config/healthcheck.sh:20-41 probes
    // component STATUS, not just data): one summary row (probe =
    // active query count, healthy = every active query progressed
    // within the staleness bound) plus one row per active query.
    // During a batch Verify pass no queries are live, so the summary
    // row is the constant (0, true) the oracle pins; the per-query
    // rows are exercised by StreamingSpec against a live query.
    val now = System.currentTimeMillis()
    val active = spark.streams.active.toSeq.sortBy(_.id.toString)
    // bound the grace map: drop first-sight records for runs that are
    // gone (a crash-looping query mints a fresh runId per restart and
    // would otherwise leak one entry per loop forever)
    val liveRunIds = active.map(_.runId.toString).toSet
    firstSeen.keySet.removeIf(k => !liveRunIds.contains(k))
    val queryRows = active.map { q =>
      val lastMs = Option(q.lastProgress).map(p =>
        java.time.Instant.parse(p.timestamp).toEpochMilli)
      // A query with NO progress yet gets a bounded startup grace, not
      // an unconditional pass: the StreamingQuery API carries no start
      // time, so the probe records first-sight and ages against that —
      // a query wedged before its first micro-batch (hung source,
      // stuck state-store open) goes unhealthy after the same bound as
      // a stalled one, which is exactly the triggerer-stall case this
      // probe exists to catch.
      val sinceMs: Long = lastMs.getOrElse(
        firstSeen.computeIfAbsent(q.runId.toString, _ => Long.box(now))
          .longValue)
      val fresh = now - sinceMs <= StreamStaleMs
      (s"streaming:query:${Option(q.name).getOrElse(q.id.toString)}",
        if (q.isActive) 1L else 0L, q.isActive && fresh)
    }
    val streamSummary = ("streaming", active.size.toLong,
      queryRows.forall(_._3))
    val fixed = (Seq(http, session, streamSummary) ++ queryRows)
      .toDF("component", "probe", "healthy")
    (tableRows :+ fixed).reduce(_ unionByName _)
      .orderBy(col("component"))
  }

  /** An active StreamingQuery whose last progress is older than this is
    * reported unhealthy by [[s12HealthProbe]] — the triggerer-stall
    * analog of the reference's component healthcheck. */
  val StreamStaleMs: Long = 5 * 60 * 1000L
  /** First time the probe saw each runId with no progress yet —
    * bounds the startup grace (keyed on runId so a RESTARTED query
    * gets a fresh grace window; dead runIds are a few bytes each). */
  private val firstSeen =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  val s12Sql: String = {
    val tables = graft.Tables.Names.map(t =>
      s"""SELECT 'table:$t' AS component,
          least((SELECT count(1) FROM $t), 1) AS probe,
          (SELECT count(1) FROM $t) > 0 AS healthy""")
    val fixed = Seq(
      "SELECT 'http:fixture' AS component, 1 AS probe, true AS healthy",
      "SELECT 'session' AS component, 1 AS probe, true AS healthy",
      "SELECT 'streaming' AS component, 0 AS probe, true AS healthy")
    (tables ++ fixed).mkString("SELECT component, CAST(probe AS BIGINT) AS probe, healthy FROM (",
      " UNION ALL ", ") ORDER BY component")
  }

  // S5 — paginated envelope explode (cloudflare_api.py:21-26).
  def s5Paginated(spark: SparkSession, sfDir: String): DataFrame =
    Sources.zonesSrc(spark)
      .select(col("page"), col("success"), col("name"), col("id"))
      .orderBy(col("id"))
  val s5Sql: String =
    """SELECT page, success, name, id FROM (VALUES
        (1, true, 'example.com', 'zone-001'),
        (1, true, 'example.org', 'zone-002'),
        (2, true, 'example.net', 'zone-003'))
       AS t(page, success, name, id) ORDER BY id"""

  // S8 — CSV config source with declared schema + header handling
  // (config exports land as CSV as often as JSON).
  def s8CsvRead(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema("device STRING, host STRING, port INT, enabled BOOLEAN")
      .option("header", "true").option("mode", "FAILFAST")
      .csv(s"${graft.Tables.FixturesDir}/devices.csv")
      .filter(col("enabled"))
      .orderBy(col("device"))
  val s8Sql: String =
    """SELECT device, host, port, enabled FROM (VALUES
        ('iowa', 'iowa.example.com', 8443, true),
        ('chicago', 'chicago.example.com', 8443, true),
        ('backup-server', 'backup.example.com', 9443, false))
       AS t(device, host, port, enabled)
       WHERE enabled ORDER BY device"""

  /** S10 — corrupt-tolerant JSONL ingestion: PERMISSIVE mode with an
    * explicit `_corrupt_record` column, the quarantine pattern a real
    * feed needs (a poison line must not kill the batch, and must not
    * silently vanish either). Spark's exact semantics are both
    * exercised: a syntactically broken line parses to all-null +
    * corrupt payload, while a TYPE-mismatched field keeps the other
    * parsed fields AND carries the corrupt payload — so quarantined
    * rows can still attribute to a device. Clean rows aggregate;
    * quarantined rows count per attributable device ('_unparseable'
    * when nothing parsed). At scale this is one pass, no shuffle
    * beyond the per-device groupBy; the quarantine side feeds a
    * dead-letter sink instead of an agg. */
  def s10JsonlCorrupt(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema("device STRING, metric BIGINT, ok BOOLEAN, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"${graft.Tables.FixturesDir}/telemetry.jsonl")
      .select(coalesce(col("device"), lit("_unparseable")).as("device"),
        col("metric"), col("_corrupt_record").isNull.as("clean"))
      .groupBy(col("device"))
      .agg(sum(when(col("clean"), 1L).otherwise(0L)).as("n_clean"),
        sum(when(!col("clean"), 1L).otherwise(0L)).as("n_quarantined"),
        sum(when(col("clean"), col("metric"))).as("metric_sum"))
      .orderBy(col("device"))
  val s10Sql: String =
    """SELECT device, n_clean, n_quarantined, metric_sum FROM (VALUES
        ('_unparseable', CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(NULL AS BIGINT)),
        ('backup-server', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(12 AS BIGINT)),
        ('chicago', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(10 AS BIGINT)),
        ('iowa', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(15 AS BIGINT)),
        ('racknerd', CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(NULL AS BIGINT)))
       AS t(device, n_clean, n_quarantined, metric_sum)
       ORDER BY device"""

  // S6 — filesystem scan over the staged-fixture dir. The oracle is
  // generated from the same directory listing at dump time (the
  // collector's staging manifest), so binaryFile's (path, length)
  // metadata is fully checked; mtimes are environment state and
  // excluded.

  /** Dump-time staging manifest: recursive file walk of the fixtures
    * dir, name-sorted — the oracle-side twin of
    * `Sources.fsScan(recursiveFileLookup=true)`. Basenames are unique
    * across the staging tree by construction. */
  private def manifest: Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    walk(new java.io.File(graft.Tables.FixturesDir)).sortBy(_.getName)
  }

  def s6FsScan(spark: SparkSession, sfDir: String): DataFrame =
    Sources.fsScan(spark, graft.Tables.FixturesDir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
        col("length"))
      .orderBy(col("file"))
  def s6Sql: String = {
    val rows = manifest
      .map(f => s"('${f.getName}', CAST(${f.length()} AS BIGINT))")
      .mkString(", ")
    s"SELECT file, length FROM (VALUES $rows) AS t(file, length) ORDER BY file"
  }

  // Compaction planner: assign small files to merge bins by target
  // output size — the "rewrite 10M tiny files into 128 MB objects"
  // maintenance pass of a 100 TB table. Bin id = floor(preceding
  // cumulative size / target), i.e. an EXCLUSIVE prefix sum over the
  // manifest in file order. The prefix sum is distributed two-phase
  // (range-partition by file → per-partition exclusive window + a
  // broadcast map of per-partition offsets, the classic scan
  // decomposition): a naive global Window.orderBy would funnel the
  // whole manifest through ONE partition — fine at fixture scale,
  // single-task at the 10M-file manifest this op exists for. The
  // offsets collect is bounded by the partition count, never the file
  // count. No pairwise packing search. Oracle = the same arithmetic
  // over the dump-time staging manifest (s6 pattern).
  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = 512L
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parts = Sources.fsScan(spark, graft.Tables.FixturesDir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
        col("length"))
      .repartitionByRange(nParts, col("file"))
      .sortWithinPartitions(col("file"))
      .withColumn("pid", spark_partition_id())
      // persist: the offsets pass and the result pass must see the SAME
      // physical partitioning (range sampling re-rolls on recompute)
      .persist()
    // phase 1: per-partition totals → exclusive running offsets. Range
    // partitions are assigned in key order, so pid ascending == file
    // ascending; absent (empty) pids contribute zero.
    val totals = parts.groupBy(col("pid")).agg(sum(col("length")).as("tot"))
      .collect().map(r => (r.getAs[Int]("pid"), r.getAs[Long]("tot")))
      .sortBy(_._1)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) {
      case ((_, acc), (pid, tot)) => (pid, acc + tot)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }
      .toMap
    val offsetOf = typedLit(offsets)
    // phase 2: within-partition exclusive window + the partition offset
    val wP = Window.partitionBy(col("pid")).orderBy(col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val planned = parts
      .withColumn("prefix",
        coalesce(sum(col("length")).over(wP), lit(0L)) +
          coalesce(element_at(offsetOf, col("pid")), lit(0L)))
      .withColumn("bin", floor(col("prefix") / lit(target)))
      .drop("pid", "prefix")
    planned
      .withColumn("bin_bytes",
        sum(col("length")).over(Window.partitionBy(col("bin"))))
      .orderBy(col("file"))
  }
  def compactionPlanSql: String = {
    val rows = manifest
      .map(f => s"('${f.getName}', CAST(${f.length()} AS BIGINT))")
      .mkString(", ")
    s"""SELECT file, length, bin,
        -- CAST: DuckDB sum(BIGINT) is HUGEINT → pandas float64; the driver
        -- hash then diverges from Spark's int64 at equal values.
        CAST(sum(length) OVER (PARTITION BY bin) AS BIGINT) AS bin_bytes
        FROM (
          SELECT file, length,
            CAST(floor(coalesce(sum(length) OVER (ORDER BY file
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)
              AS BIGINT) AS bin
          FROM (VALUES $rows) AS t(file, length))
        ORDER BY file"""
  }

  // VARIANT semi-structured path (Spark 4): parse the JSON props column
  // ONCE into a variant value, then cheap typed field extractions —
  // the open-schema ingestion shape that replaces per-field
  // get_json_object reparsing. The oracle mirrors with DuckDB's JSON
  // extraction (no variant type there; the VALUES are what's checked).
  def variantExtract(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"),
        expr("variant_get(v, '$.missing', 'string')").as("absent"))
      .filter(col("k") % 7 === 0)
      .orderBy(col("event_id"))
  val variantExtractSql: String =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.k') AS k_str,
       json_extract_string(props, '$.missing') AS absent
       FROM events
       WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
       ORDER BY event_id"""

  /** Compaction EXECUTED — the action half of [[compactionPlan]] (the
    * d4_backfill_run / dedup_span_scrub pattern applied to table
    * maintenance): each planned bin's files are read, concatenated in
    * file-name order (bins are ≤ target + one file by construction, so
    * the in-memory sort and the merged blob are both bounded), written
    * as one object into a per-(session, staging-fingerprint) dir, and
    * the OUTPUT DIRECTORY is re-scanned so the reported bytes are what
    * landed on disk, not what the plan promised. The oracle states the
    * plan's own per-bin arithmetic — rows match exactly iff every
    * planned byte was written, proving plan = execution. Writes are
    * whole-file overwrites keyed by bin id: a retried task rewrites
    * its bin instead of double-appending. */
  def compactionRun(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val outDir = s"${graft.Util.sessionTmpDir(spark, "graft_compact")}/" +
      graft.Util.fileFingerprint(graft.Tables.FixturesDir)
    // Writes go through the Hadoop FileSystem resolved from the
    // session's hadoopConfiguration (serialized to the tasks), not
    // java.nio on a driver-derived local path: on a cluster the
    // executor-local java.io write would land on the wrong disk (or
    // fail outright for an object-store outDir) and the read-back join
    // below would silently drop bins. Local mode resolves to the same
    // local path as before.
    val serConf = graft.Util.serHadoopConf(spark)
    val outP = new org.apache.hadoop.fs.Path(outDir)
    outP.getFileSystem(serConf.value).mkdirs(outP)
    val plan = compactionPlan(spark, sfDir).select(col("file"), col("bin"))
    val bytes = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(graft.Tables.FixturesDir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
        col("content"))
      .join(plan, "file")
    // One (bin, n_files) row per bin — manifest-scale by construction
    // (bins = corpus bytes / target), so collecting the write-side
    // RESULT is bounded; crucially it also MATERIALIZES the writes
    // before the output dir is listed below, with no persist() left
    // behind to age the session cache (r9 advice: the old
    // persist-count-join shape leaked a cached plan per invocation).
    val binRows = bytes.select(col("bin"), col("file"), col("content"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (bin, it) =>
        val parts = it.toSeq.sortBy(_._2)
        val p = new org.apache.hadoop.fs.Path(outDir, f"bin_$bin%05d.merged")
        val fs = p.getFileSystem(serConf.value)
        // attempt-atomic whole-file write keyed by bin id: a retried
        // or speculative attempt lands a complete rewrite via
        // temp+rename, never an interleaved blend
        graft.Util.atomicCreate(fs, p)(os => parts.foreach(x => os.write(x._3)))
        (bin, parts.length.toLong)
      }
      .collect()
    binRows.toSeq.toDF("bin", "n_files")
      .join(Sources.fsScan(spark, outDir)
          .select(regexp_extract(col("path"), "bin_(\\d+)", 1)
            .cast("long").as("bin"), col("length").as("written_bytes")),
        "bin")
      .orderBy(col("bin"))
  }
  def compactionRunSql: String = {
    val rows = manifest
      .map(f => s"('${f.getName}', CAST(${f.length()} AS BIGINT))")
      .mkString(", ")
    s"""SELECT bin, count(1) AS n_files,
        CAST(sum(length) AS BIGINT) AS written_bytes
        FROM (
          SELECT file, length,
            CAST(floor(coalesce(sum(length) OVER (ORDER BY file
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)
              AS BIGINT) AS bin
          FROM (VALUES $rows) AS t(file, length))
        GROUP BY bin ORDER BY bin"""
  }

  // Vacuum planner — the third table-maintenance pass next to
  // compaction (rewrite small files) and retention (age out data): find
  // ORPHAN files on disk that no manifest row claims, classify the
  // whole listing, and size the reclaim. The manifest here is the
  // registered set (md5(name) >= '2' — a deterministic ~1/8 of the
  // staging tree plays unregistered, the way failed writes and killed
  // compactions leave claims-less files behind an Iceberg/Delta
  // manifest). Shape: one fs listing anti-joined against the manifest
  // — at 10M files both sides are (name, length) metadata, never
  // content; the summary is a bounded aggregate of the same pass.
  def vacuumPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val listed = Sources.fsScan(spark, graft.Tables.FixturesDir)
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
        col("length"))
    val registered = listed
      .filter(md5(encode(col("file"), "utf-8")) >= "2")
      .select(col("file").as("m_file"))
    listed.join(registered, col("file") === col("m_file"), "left")
      .select(col("file"), col("length"),
        col("m_file").isNull.as("orphan"))
      .orderBy(col("file"))
  }
  def vacuumPlanSql: String = {
    val rows = manifest
      .map(f => s"('${f.getName}', CAST(${f.length()} AS BIGINT))")
      .mkString(", ")
    s"""SELECT file, length, md5(file) < '2' AS orphan
        FROM (VALUES $rows) AS t(file, length)
        ORDER BY file"""
  }

  // S7 — disk-usage probe (dags/Airflow_Cleanup.py:62-72: used/total
  // ratio vs a 75 % ceiling). The live `shutil.disk_usage` analogue
  // (`Sources.diskUsage`) stays as a driver-side utility, but the
  // CONTRACT query probes the staged table dir's manifest — sum of
  // binaryFile lengths vs a config-store capacity — so the V7-shape
  // ratio is deterministic and fully oracle-checked instead of live
  // environment state. Integer compare (used*100 > cap*75) keeps the
  // verdict float-free; the pct is e4 fixed point.
  def s7UsageRatio(spark: SparkSession, sfDir: String): DataFrame = {
    val cap = Config.valueRow(spark, "staging_capacity_bytes", "32768")
      .select(col("value").cast("long").as("capacity_bytes"))
    Sources.fsScan(spark, graft.Tables.FixturesDir)
      .agg(sum(col("length")).as("used_bytes"))
      .crossJoin(broadcast(cap))
      .select(col("used_bytes"), col("capacity_bytes"),
        e4(lit(100.0) * col("used_bytes") / col("capacity_bytes"))
          .as("used_pct_e4"),
        (col("used_bytes") * lit(100L) > col("capacity_bytes") * lit(75L))
          .as("over_75pct"))
  }
  def s7Sql: String = {
    val used = manifest.map(_.length()).sum
    s"""SELECT CAST($used AS BIGINT) AS used_bytes, cfg.capacity_bytes,
        CAST(floor(100.0 * $used / cfg.capacity_bytes * 10000.0) AS BIGINT)
          AS used_pct_e4,
        $used * 100 > cfg.capacity_bytes * 75 AS over_75pct
        FROM (
          SELECT coalesce(CAST(max(CASE WHEN key = 'staging_capacity_bytes'
                   THEN value END) AS BIGINT), 32768) AS capacity_bytes
          FROM read_json_auto('${graft.Tables.FixturesDir}/graft_config.jsonl',
                              format='newline_delimited')
        ) cfg"""
  }

  val queries: Map[String, QFn] = Map(
    "p1_trycast_extract" -> p1TrycastExtract,
    "p2_id_lookup" -> p2IdLookup,
    "p3_type_filter" -> p3TypeFilter,
    "p4_compound_filter" -> p4CompoundFilter,
    "p5_ci_substring" -> p5CiSubstring,
    "p6_union_nonnull" -> p6UnionNonnull,
    "p7_case_map" -> p7CaseMap,
    "p8_shape_check" -> p8ShapeCheck,
    "p9_doc_equality" -> p9DocEquality,
    "p10_map_explode" -> p10MapExplode,
    "f3_concat" -> f3Concat,
    "f5_iso_parse" -> f5IsoParse,
    "s1_staged_read" -> s1StagedRead,
    "s2_dsv2_pushdown" -> s2Dsv2Pushdown,
    "s4_soft_fail" -> s4SoftFail,
    "s5_paginated" -> s5Paginated,
    "s9_live_fetch" -> s9LiveFetch,
    "s11_live_paginated" -> s11LivePaginated,
    "s12_health_probe" -> s12HealthProbe,
    "s6_fs_scan" -> s6FsScan,
    "vacuum_plan" -> vacuumPlan,
    "compaction_run" -> compactionRun,
    "s8_csv_read" -> s8CsvRead,
    "s10_jsonl_corrupt" -> s10JsonlCorrupt,
    "s7_usage_ratio" -> s7UsageRatio,
    "variant_extract" -> variantExtract,
    "compaction_plan" -> compactionPlan)

  val oracles: Map[String, String] = Map(
    "p1_trycast_extract" -> p1Sql,
    "p2_id_lookup" -> p2Sql,
    "p3_type_filter" -> p3Sql,
    "p4_compound_filter" -> p4Sql,
    "p5_ci_substring" -> p5Sql,
    "p6_union_nonnull" -> p6Sql,
    "p7_case_map" -> p7Sql,
    "p8_shape_check" -> p8Sql,
    "p9_doc_equality" -> p9Sql,
    "p10_map_explode" -> p10Sql,
    "f3_concat" -> f3Sql,
    "f5_iso_parse" -> f5Sql,
    "s1_staged_read" -> s1Sql,
    "s2_dsv2_pushdown" -> s2Sql,
    "s4_soft_fail" -> s4Sql,
    "s5_paginated" -> s5Sql,
    "s9_live_fetch" -> s9Sql,
    "s11_live_paginated" -> s11Sql,
    "s12_health_probe" -> s12Sql,
    "s6_fs_scan" -> s6Sql,
    "vacuum_plan" -> vacuumPlanSql,
    "compaction_run" -> compactionRunSql,
    "s8_csv_read" -> s8Sql,
    "s10_jsonl_corrupt" -> s10Sql,
    "s7_usage_ratio" -> s7Sql,
    "compaction_plan" -> compactionPlanSql,
    "variant_extract" -> variantExtractSql)
}
