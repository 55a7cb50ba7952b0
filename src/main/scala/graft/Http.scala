package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.matching.Regex

/** Thin JDK HTTP listener over [[Api]] — the reference's REST router
  * (`src/rpc.h:25-94`, served by `src/http_serve.cpp`) re-expressed as a
  * `com.sun.net.httpserver` route table. All semantics live in [[Api]]; this
  * class only matches method+path, decodes bodies/params (Jackson — bundled
  * with Spark), and renders the reference's error envelope
  * (`src/errors.cpp:41-51` `{"error":{"class":…,"message":…,"detail":…}}`).
  *
  * Route parity notes:
  *  - `/v1/cluster/init|join` ack with a `server_name` like the reference
  *    (`src/rpc_cluster.cpp`) but configure nothing: Spark's cluster manager
  *    owns membership, so init/join are client-compat no-ops.
  *  - the internode routes are intentionally absent — internode transfer and
  *    replication are Spark shuffle/storage concerns (SURVEY §2.1).
  *  - the reference pushes subscription web-hooks; here a subscription is
  *    polled via GET on its own route (Api.subscriptionPoll doc).
  *
  * `?now=` (epoch ms) is accepted on time-sensitive routes so tests and
  * replays are deterministic; absent, wall-clock is used. Port 0 binds an
  * ephemeral port — read it back from [[port]]. */
final class Http(api: Api, requestedPort: Int = 0) {

  private val mapper = new ObjectMapper()

  private val server = HttpServer.create(new InetSocketAddress(requestedPort), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null) // serial dispatch; Spark parallelism is per-query

  def start(): Http = { server.start(); this }
  def stop(): Unit = server.stop(0)
  def port: Int = server.getAddress.getPort

  // ------------------------------------------------------------------ routing
  private val Table    = """/v1/table/([a-z0-9_]+)/?""".r
  private val TableProp = """/v1/table/([a-z0-9_]+)/property/([a-z0-9_.]+)/?""".r
  private val TableSettingsR = """/v1/table/([a-z0-9_]+)/settings/?""".r
  private val Tables   = """/v1/tables/?""".r
  private val Insert   = """/v1/insert/([a-z0-9_]+)/?""".r
  private val FlushR   = """/v1/table/([a-z0-9_]+)/flush/?""".r
  private val QEvent   = """/v1/query/([a-z0-9_]+)/event/?""".r
  private val QSegment = """/v1/query/([a-z0-9_]+)/segment/?""".r
  private val QBatch   = """/v1/query/([a-z0-9_]+)/batch/?""".r
  private val QCustomer = """/v1/query/([a-z0-9_]+)/customer/?""".r
  private val QProperty = """/v1/query/([a-z0-9_]+)/property/([a-z0-9_.]+)/?""".r
  private val QHistogram = """/v1/query/([a-z0-9_]+)/histogram/([a-z0-9_.]+)/?""".r
  private val Subscription = """/v1/subscription/([a-z0-9_]+)/([a-z0-9_.]+)/([a-z0-9_.]+)/?""".r
  private val ClusterInit = """/v1/cluster/(init|join)/?""".r
  private val StatusR  = """/v1/status/?""".r

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    val params = parseQuery(Option(ex.getRequestURI.getRawQuery))
    def body: String = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    def now: Long = params.get("now").map(_.toLong)
      .getOrElse(System.currentTimeMillis())
    try {
      val resp: Option[String] = (method, path) match {
        case ("PUT", ClusterInit(_))  => Some("""{"server_name":"graft"}""")
        case ("GET", StatusR())       => Some(api.status())
        case ("GET", Tables())        => Some(api.tableList())
        case ("POST", Table(t))       => Some(api.tableCreate(parseTableMeta(t, body)))
        case ("GET", Table(t))        => Some(api.tableDescribe(t))
        case ("DELETE", Table(t))     => Some(api.tableDrop(t))
        case ("PUT", TableSettingsR(t)) =>
          val n = mapper.readTree(body)
          Some(api.settingsUpdate(t, s => patchSettings(s, n)))
        case ("PUT", TableProp(t, p)) =>
          val n = mapper.readTree(body)
          Some(api.propertyAdd(t, PropDef(p,
            ptype = n.path("type").asText(),
            isSet = n.path("is_set").asBoolean(false),
            isCustomer = n.path("is_customer").asBoolean(false))))
        case ("DELETE", TableProp(t, p)) => Some(api.propertyDrop(t, p))
        case ("POST", Insert(t))      => Some(api.insert(t, splitEvents(body), now))
        // group commit: force-merge any pending sidelog WAL into bucket
        // parquet (a no-op when nothing is pending / flush_rows=0)
        case ("POST", FlushR(t))      =>
          api.catalog.flush(t, now)
          Some(s"""{"message":"flushed","table":"$t"}""")
        case ("POST", QEvent(t))      =>
          Some(api.queryEvent(t, body, now,
            trim = params.get("trim").map(_.toInt).getOrElse(0)))
        case ("POST", QSegment(t))    => Some(api.querySegment(t, body, now))
        case ("POST", QBatch(t))      => Some(api.queryBatch(t, body, now))
        case ("GET", QCustomer(t))    =>
          Some(api.queryCustomer(t, params.getOrElse("id",
            throw new IllegalArgumentException("missing id= parameter"))))
        case ("GET", QProperty(t, p)) =>
          val modes = Seq("gt", "gte", "lt", "lte", "eq", "between", "rx", "sub")
            .flatMap(m => params.get(m).map(m -> _))
          Some(api.queryProperty(t, p,
            bucket = params.get("bucket").map(_.toDouble),
            modes = modes,
            order = params.getOrElse("order", "desc"),
            trim = params.get("trim").map(_.toInt).getOrElse(0),
            segments = params.get("segments")
              .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)))
        case ("POST", QHistogram(t, name)) =>
          Some(api.queryHistogram(t, name, body, now,
            bucket = params.get("bucket").map(_.toDouble),
            min = params.get("min").map(_.toDouble),
            max = params.get("max").map(_.toDouble),
            foreach = params.get("foreach")))
        case ("PUT", Subscription(t, seg, sub)) =>
          Some(api.subscriptionCreate(t, seg, sub,
            retentionMs = params.get("retention_ms").map(_.toLong)
              .getOrElse(3L * 3600 * 1000),
            nowMs = now))
        case ("DELETE", Subscription(t, seg, sub)) =>
          Some(api.subscriptionDelete(t, seg, sub))
        case ("GET", Subscription(t, seg, sub)) =>
          Some(api.subscriptionPoll(t, seg, sub, now))
        case _ => None
      }
      resp match {
        case Some(json) => send(ex, 200, json)
        case None => send(ex, 404, errJson("config", "route not found", path))
      }
    } catch {
      case e: IllegalArgumentException =>
        send(ex, 400, errJson("query", "general_error", e.getMessage))
      case e: Throwable =>
        send(ex, 500, errJson("internal", "run_time_exception_triggered",
          String.valueOf(e.getMessage)))
    } finally ex.close()
  }

  // ------------------------------------------------------------------ helpers
  private def send(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def errJson(cls: String, message: String, detail: String): String =
    s"""{"error":{"class":${Json.str(cls)},"message":${Json.str(message)},"detail":${Json.str(detail)}}}"""

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.filter(_.nonEmpty).map(_.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(dec(k) -> dec(v))
        case Array(k)    => Some(dec(k) -> "")
        case _           => None
      }
    }.toMap).getOrElse(Map.empty)

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  /** `POST /v1/table/{t}` body → [[TableMeta]] (docs/rest/README.md:28-79):
    * `id_type` textual|numeric, `properties` defs, `event_order`, plus any
    * settings keys inline (the reference nests them under table settings). */
  private def parseTableMeta(table: String, body: String): TableMeta = {
    val n = mapper.readTree(body)
    val props = jsonSeq(n.path("properties")).map { p =>
      PropDef(p.path("name").asText(),
        p.path("type").asText(),
        isSet = p.path("is_set").asBoolean(false),
        isCustomer = p.path("is_customer").asBoolean(false))
    }
    val base = TableSettings(
      idTextual = n.path("id_type").asText("textual") != "numeric",
      eventOrder = jsonSeq(n.path("event_order")).map(_.asText()))
    TableMeta(table, props,
      if (n.has("settings")) patchSettings(base, n.path("settings")) else base)
  }

  /** Overlay the reference's settings keys (`src/table.cpp:193-201`
    * serializeSettings: `event_ttl` seconds, `event_max`, `session_time`
    * seconds, `tz_offset` seconds, `segment_interval` ms) onto
    * [[TableSettings]]; unknown keys are ignored like the reference's
    * deserializer. */
  private def patchSettings(s: TableSettings, n: JsonNode): TableSettings = {
    var out = s
    if (n.has("event_max")) out = out.copy(eventMax = n.path("event_max").asInt())
    if (n.has("event_ttl"))
      out = out.copy(eventTtlMs = n.path("event_ttl").asLong() * 1000L)
    if (n.has("session_time"))
      out = out.copy(sessionTimeMs = n.path("session_time").asLong() * 1000L)
    if (n.has("tz_offset"))
      out = out.copy(tzOffsetMs = n.path("tz_offset").asLong() * 1000L)
    if (n.has("segment_interval"))
      out = out.copy(segmentIntervalMs = n.path("segment_interval").asLong())
    if (n.has("flush_rows"))
      out = out.copy(flushRows = n.path("flush_rows").asInt())
    out
  }

  /** Insert bodies are a JSON array of event objects (the samples repo
    * format) or newline-delimited objects; either way [[Api.insert]] takes
    * one serialized object per element. */
  private def splitEvents(body: String): Seq[String] = {
    val trimmed = body.trim
    if (trimmed.startsWith("["))
      jsonSeq(mapper.readTree(trimmed)).map(mapper.writeValueAsString)
    else trimmed.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def jsonSeq(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    val it = n.elements()
    while (it.hasNext) b += it.next()
    b.result()
  }
}
