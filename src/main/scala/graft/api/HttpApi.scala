package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.store.SeriesStore

/**
 * The HTTP front-end, on the JDK's built-in server (zero dependencies):
 * graphite-web-compatible routes backed by [[Render]] and [[Catalog]].
 * (ref cmd/carbonapi/http/init.go:15-41 for the route table)
 *
 *   /render?target=EXPR&from=F&until=U&format=json|csv|raw&maxDataPoints=N
 *   /metrics/find?query=GLOB[&format=treejson|completer]
 *   /metrics/expand?query=GLOB
 *   /tags/autoComplete/tags?tagPrefix=P&limit=N
 *   /tags/autoComplete/values?tag=T&valuePrefix=P&limit=N
 *   /functions            /version            /lb_check
 *
 * Each request is one Spark action; concurrent requests ride Spark's own
 * scheduler (FAIR pools replace the reference's goroutine limiter).
 */
class HttpApi(spark: SparkSession, store: SeriesStore, port: Int = 8081) {

  @volatile private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/render", handleBytes(render))
    server.createContext("/info", handle(info))
    server.createContext("/metrics/find", handleBytes(find))
    server.createContext("/metrics/expand", handle(expand))
    // JDK HttpServer picks the longest matching context, so the bare /tags
    // route coexists with the autoComplete ones (ref init.go:35-36 routes
    // both through tagHandler keyed on the path suffix)
    server.createContext("/tags", tagsDispatch _)
    server.createContext("/tags/autoComplete/tags", handle(tagNames))
    server.createContext("/tags/autoComplete/values", handle(tagValues))
    server.createContext("/functions", handle(functions))
    server.createContext("/version", handle(_ => ("1.0.0-graft", "text/plain")))
    server.createContext("/lb_check", handle(_ => ("Ok\n", "text/plain")))
    server.createContext("/_internal/capabilities", handle(capabilities))
    server.createContext("/", handle(_ => (usageMsg, "text/plain")))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------- handlers

  private type Params = Map[String, Seq[String]]

  private def handle(f: Params => (String, String))(ex: HttpExchange): Unit =
    handleBytes(p => { val (s, ct) = f(p); (s.getBytes(StandardCharsets.UTF_8), ct) })(ex)

  private def handleBytes(f: Params => (Array[Byte], String))(ex: HttpExchange): Unit = {
    val out =
      try {
        val (body, ct) = f(params(ex))
        val suffix = if (ct.startsWith("application/json") || ct.startsWith("text/")) "; charset=utf-8" else ""
        ex.getResponseHeaders.set("Content-Type", ct + suffix)
        (200, body)
      } catch {
        case e: IllegalArgumentException =>
          (400, s"""{"error":${quote(e.getMessage)}}""".getBytes(StandardCharsets.UTF_8))
        case e: Throwable =>
          (500, s"""{"error":${quote(String.valueOf(e.getMessage))}}""".getBytes(StandardCharsets.UTF_8))
      }
    ex.sendResponseHeaders(out._1, out._2.length)
    val os = ex.getResponseBody
    try os.write(out._2) finally os.close()
  }

  private def params(ex: HttpExchange): Params = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    // POST bodies are urlencoded forms merged with the query string, like
    // the reference's r.ParseForm() (Grafana POSTs /render)
    val form =
      if (ex.getRequestMethod == "POST" &&
          Option(ex.getRequestHeaders.getFirst("Content-Type"))
            .forall(_.startsWith("application/x-www-form-urlencoded")))
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      else ""
    (q + "&" + form).split("&").filter(_.nonEmpty).toSeq
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (dec(kv), "") else (dec(kv.take(i)), dec(kv.drop(i + 1)))
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def one(p: Params, k: String, default: String = ""): String =
    p.get(k).flatMap(_.headOption).getOrElse(default)

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ---- /render with a short-TTL response cache (the reference's single
  // biggest practical throughput lever: identical dashboard queries within
  // the TTL skip re-evaluation entirely — ref render_handler.go:172-247,
  // cache.go:22-60). Keyed by the full query shape; `noCache=true` bypasses.
  private val cacheTtlSec: Long = sys.env.get("GRAFT_RESPONSE_CACHE_SEC").flatMap(_.toLongOption).getOrElse(60L)
  private val respCache = new java.util.concurrent.ConcurrentHashMap[String, (Long, Array[Byte], String)]()

  private def render(p: Params): (Array[Byte], String) = {
    val targets = p.getOrElse("target", Seq.empty)
    require(targets.nonEmpty, "missing target parameter")
    val format = one(p, "format", "json")
    val from = one(p, "from", "-24h"); val until = one(p, "until", "now")
    val mdp = one(p, "maxDataPoints", "0").toLong
    val noNull = one(p, "noNullPoints") == "true"
    val tzName = one(p, "tz")
    val tz =
      if (tzName.isEmpty) java.time.ZoneOffset.UTC
      else try java.time.ZoneId.of(tzName)
      catch { case _: Exception => throw new IllegalArgumentException(s"bad tz: $tzName") }
    val useCache = cacheTtlSec > 0 && one(p, "noCache") != "true"
    // the full sorted param map is the key: every render-affecting param
    // (template, picture params, timestampFormat, jsonp, …) varies the body
    // (ref responseCacheComputeKey render_handler.go:422-448)
    val key = p.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${v.mkString("|")}" }.mkString(" ")
    val nowMs = System.currentTimeMillis()
    if (useCache) {
      val hit = respCache.get(key)
      if (hit != null && hit._1 > nowMs) return (hit._2, hit._3)
    }
    val (body, ct) = Render.renderBytes(spark, store, targets,
      from = from, until = until, maxDataPoints = mdp,
      format = format, noNullPoints = noNull, tz = tz, graphParams = p)
    if (useCache) {
      if (respCache.size > 4096) // lazy TTL sweep keeps the map bounded
        respCache.entrySet.removeIf(e => e.getValue._1 <= nowMs)
      respCache.put(key, (nowMs + cacheTtlSec * 1000, body, ct))
    }
    (body, ct)
  }

  /** /info: per-target storage metadata (ref info_handlers.go:19-90;
    * shape mirrors ZipperInfoResponse with this engine as the one backend). */
  private def info(p: Params): (String, String) = {
    val targets = p.getOrElse("target", Seq.empty)
    require(targets.nonEmpty, "no target specified")
    val step = store.stepHint.getOrElse(60L)
    val metrics = targets.flatMap(t => Catalog.expand(spark, store, t)).distinct.map { m =>
      s"""{"name":${quote(m)},"consolidationFunc":"average","maxRetention":${step * 10080},""" +
        s""""xFilesFactor":0,"retentions":[{"secondsPerPoint":$step,"numberOfPoints":10080}]}"""
    }
    (s"""{"graft":{"metrics":${metrics.mkString("[", ",", "]")}}}""", "application/json")
  }

  /** /metrics/find formats: treejson (default), completer, raw, pickle,
    * protobuf v2/v3 — the reference serves all of them
    * (ref find_handlers.go:243,301-372). */
  private def find(p: Params): (Array[Byte], String) = {
    val query = one(p, "query")
    require(query.nonEmpty, "missing query parameter")
    val nodes = Catalog.find(spark, store, query)
    val pairs = nodes.map(n => (n.id, n.leaf))
    def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)
    one(p, "format", "treejson") match {
      case "completer" =>
        val items = nodes.map { n =>
          s"""{"path":${quote(if (n.leaf) n.id else n.id + ".")},"name":${quote(n.text)},"is_leaf":"${if (n.leaf) 1 else 0}"}"""
        }.mkString("[", ",", "]")
        (utf8(s"""{"metrics":$items}"""), "application/json")
      case "raw" =>
        (WireFormats.findList(pairs), "text/plain")
      case "pickle" =>
        // "we have everything" up to now+60, like the reference
        (WireFormats.findPickle(pairs, System.currentTimeMillis() / 1000 + 60), "application/pickle")
      case "protobuf" | "protobuf3" | "carbonapi_v3_pb" =>
        (WireFormats.findProtobufV3(query, pairs), "application/x-protobuf")
      case "protobuf2" | "carbonapi_v2_pb" =>
        (WireFormats.findProtobufV2(query, pairs), "application/x-protobuf")
      case _ => (utf8(Catalog.treeJson(nodes)), "application/json")
    }
  }

  private def expand(p: Params): (String, String) = {
    val query = one(p, "query")
    require(query.nonEmpty, "missing query parameter")
    val results = Catalog.expand(spark, store, query).map(quote).mkString("[", ",", "]")
    (s"""{"results":$results}""", "application/json")
  }

  /** Top-level /tags[/values]: graphite tag listing, keyed by path suffix
    * like the reference's tagHandler (ref tags_handler.go:92-99). */
  private def tagsDispatch(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    if (path.endsWith("values"))
      handle(p => (Catalog.tagValues(spark, store, one(p, "tag"),
        one(p, "valuePrefix", one(p, "filter")), limitOf(p))
        .map(quote).mkString("[", ",", "]"), "application/json"))(ex)
    else if (path.endsWith("tags"))
      handle(p => (Catalog.tagNames(spark, store, one(p, "tagPrefix", one(p, "filter")), limitOf(p))
        .map(quote).mkString("[", ",", "]"), "application/json"))(ex)
    else {
      val body = "Not Found".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(404, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  }

  /** reference limit=-1 means unbounded; our catalog wants a positive cap */
  private def limitOf(p: Params): Int =
    one(p, "limit", "-1").toIntOption.filter(_ > 0).getOrElse(Int.MaxValue)

  /** /_internal/capabilities: zipper protocol negotiation surface
    * (ref capability.go:66-74). JSON only — the pb form of this endpoint is
    * zipper-to-zipper and we have no zipper tier. */
  private def capabilities(p: Params): (String, String) = {
    val host = try java.net.InetAddress.getLocalHost.getHostName catch { case _: Exception => "(unknown)" }
    (s"""{"supportedProtocols":["carbonapi_v3_pb","carbonapi_v2_pb","graphite-web-pickle","graphite-web-pickle-1.1","carbonapi_v2_json"],""" +
      s""""name":${quote(host)},"highPrecisionTimestamps":false,"supportFilteringFunctions":false,""" +
      s""""likeSplittedRequests":false,"supportStreaming":false}""", "application/json")
  }

  private val usageMsg: String =
    """supported requests:
      |    /functions/
      |    /info/?target=
      |    /lb_check/
      |    /metrics/find/?query=
      |    /render/?target=
      |    /tags/autoComplete/tags/
      |    /tags/autoComplete/values/
      |    /version/
      |""".stripMargin

  private def tagNames(p: Params): (String, String) =
    (Catalog.tagNames(spark, store, one(p, "tagPrefix"), one(p, "limit", "100").toInt)
      .map(quote).mkString("[", ",", "]"), "application/json")

  private def tagValues(p: Params): (String, String) =
    (Catalog.tagValues(spark, store, one(p, "tag"), one(p, "valuePrefix"), one(p, "limit", "100").toInt)
      .map(quote).mkString("[", ",", "]"), "application/json")

  private def functions(p: Params): (String, String) =
    (Catalog.functions.map(quote).mkString("[", ",", "]"), "application/json")
}
