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
    server.createContext("/render", handle(render))
    server.createContext("/metrics/find", handle(find))
    server.createContext("/metrics/expand", handle(expand))
    server.createContext("/tags/autoComplete/tags", handle(tagNames))
    server.createContext("/tags/autoComplete/values", handle(tagValues))
    server.createContext("/functions", handle(functions))
    server.createContext("/version", handle(_ => ("1.0.0-graft", "text/plain")))
    server.createContext("/lb_check", handle(_ => ("Ok\n", "text/plain")))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------- handlers

  private type Params = Map[String, Seq[String]]

  private def handle(f: Params => (String, String))(ex: HttpExchange): Unit = {
    val out =
      try {
        val (body, ct) = f(params(ex))
        ex.getResponseHeaders.set("Content-Type", ct + "; charset=utf-8")
        (200, body)
      } catch {
        case e: IllegalArgumentException => (400, s"""{"error":${quote(e.getMessage)}}""")
        case e: Throwable => (500, s"""{"error":${quote(String.valueOf(e.getMessage))}}""")
      }
    val bytes = out._2.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(out._1, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def params(ex: HttpExchange): Params = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split("&").filter(_.nonEmpty).toSeq
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

  private def render(p: Params): (String, String) = {
    val targets = p.getOrElse("target", Seq.empty)
    require(targets.nonEmpty, "missing target parameter")
    val format = one(p, "format", "json")
    val body = Render.render(spark, store, targets,
      from = one(p, "from", "-24h"),
      until = one(p, "until", "now"),
      maxDataPoints = one(p, "maxDataPoints", "0").toLong,
      format = format,
      noNullPoints = one(p, "noNullPoints") == "true")
    (body, if (format == "json") "application/json" else "text/plain")
  }

  private def find(p: Params): (String, String) = {
    val query = one(p, "query")
    require(query.nonEmpty, "missing query parameter")
    val nodes = Catalog.find(spark, store, query)
    one(p, "format", "treejson") match {
      case "completer" =>
        val items = nodes.map { n =>
          s"""{"path":${quote(if (n.leaf) n.id else n.id + ".")},"name":${quote(n.text)},"is_leaf":"${if (n.leaf) 1 else 0}"}"""
        }.mkString("[", ",", "]")
        (s"""{"metrics":$items}""", "application/json")
      case _ => (Catalog.treeJson(nodes), "application/json")
    }
  }

  private def expand(p: Params): (String, String) = {
    val query = one(p, "query")
    require(query.nonEmpty, "missing query parameter")
    val results = Catalog.expand(spark, store, query).map(quote).mkString("[", ",", "]")
    (s"""{"results":$results}""", "application/json")
  }

  private def tagNames(p: Params): (String, String) =
    (Catalog.tagNames(spark, store, one(p, "tagPrefix"), one(p, "limit", "100").toInt)
      .map(quote).mkString("[", ",", "]"), "application/json")

  private def tagValues(p: Params): (String, String) =
    (Catalog.tagValues(spark, store, one(p, "tag"), one(p, "valuePrefix"), one(p, "limit", "100").toInt)
      .map(quote).mkString("[", ",", "]"), "application/json")

  private def functions(p: Params): (String, String) =
    (Catalog.functions.map(quote).mkString("[", ",", "]"), "application/json")
}
