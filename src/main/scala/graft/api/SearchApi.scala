package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/**
 * The corpus-retrieval serving front-end — the §2.10 endpoint over the
 * PERSISTED artifacts only (term index + doclen/meta sidecars, IVF-PQ
 * index + centroids + codebooks): a deployed replica mounts the artifact
 * paths and answers ranked queries with zero corpus scans and zero
 * startup training. The graphite twin is [[HttpApi]]; this server carries
 * the LLM-pipeline surface (no reference analog — carbonapi serves series,
 * not documents).
 *
 *   /search?q=w1+w2&k=10                     → BM25 top-k        (p87 path)
 *   /search?q=w1+w2&mode=hybrid&vec=f,f,...  → BM25 × IVF-PQ RRF (p88+p34)
 *   /search?phrase=w1+w2+w3                  → exact phrase      (p89 path)
 *   /search?glob=sc[ae]n*&k=10               → glob terms        (p95 path)
 *   /lb_check
 *
 * Each request is one Spark action over partition-pruned index slices —
 * request cost tracks the query (terms' df, nprobe cells), never the
 * corpus, the property the p84/p87 ScaleBench query arms measure.
 */
class SearchApi(spark: SparkSession, termIndexDir: String,
                ivfPath: String, codebooksPath: String, port: Int = 0) {

  @volatile private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/search", handle(search))
    server.createContext("/lb_check", handle(_ => "Ok\n"))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(f: Map[String, String] => String)(ex: HttpExchange): Unit = {
    val (code, body) =
      try (200, f(query(ex)))
      catch {
        case e: IllegalArgumentException => (400, s"""{"error":${q(e.getMessage)}}""")
        case e: Throwable => (500, s"""{"error":${q(String.valueOf(e.getMessage))}}""")
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def search(p: Map[String, String]): String = {
    val k = p.getOrElse("k", "10").toInt
    require(k > 0 && k <= 1000, s"k out of range: $k")
    p.get("glob") match {
      case Some(g) =>
        val rows = graft.pipeline.TextStats
          .globSearchTermIndex(spark, termIndexDir, g)
          .orderBy(org.apache.spark.sql.functions.desc("n_hits"),
            org.apache.spark.sql.functions.col("doc_id"))
          .limit(k).collect()
        return rows.map(r => s"""{"doc_id":${r.getLong(0)},"n_terms":${r.getLong(1)},"n_hits":${r.getLong(2)}}""")
          .mkString("""{"results":[""", ",", "]}")
      case None => ()
    }
    p.get("phrase") match {
      case Some(ph) =>
        val terms = ph.split("[+ ]").filter(_.nonEmpty).toSeq
        val rows = graft.pipeline.TextStats
          .phraseSearch(spark, termIndexDir, terms)
          .orderBy(org.apache.spark.sql.functions.desc("n_occur"),
            org.apache.spark.sql.functions.col("doc_id"))
          .limit(k).collect()
        rows.map(r => s"""{"doc_id":${r.getLong(0)},"n_occur":${r.getLong(1)}}""")
          .mkString("""{"results":[""", ",", "]}")
      case None =>
        val terms = p.getOrElse("q", "").split("[+ ]").filter(_.nonEmpty).toSeq
        require(terms.nonEmpty, "missing q or phrase parameter")
        p.getOrElse("mode", "bm25") match {
          case "bm25" =>
            val rows = graft.pipeline.TextStats
              .bm25TopK(spark, termIndexDir, terms, k = k).collect()
            rows.map(r => s"""{"doc_id":${r.getLong(0)},"n_terms":${r.getLong(1)},"score":${r.getDouble(2)}}""")
              .mkString("""{"results":[""", ",", "]}")
          case "hybrid" =>
            val vec = p.getOrElse("vec", "")
            require(vec.nonEmpty, "hybrid mode needs vec=f,f,...")
            val qv = vec.split(",").map(_.trim.toFloat)
            val pool = p.getOrElse("pool", "20").toInt
            val rows = graft.pipeline.Similarity.hybridServeTopK(spark,
              termIndexDir, terms, ivfPath, codebooksPath, qv,
              k = k, pool = pool).collect()
            rows.map(r => s"""{"doc_id":${r.getLong(0)},"bm_rank":${r.getLong(1)},"ann_rank":${r.getLong(2)},"rrf_x1e6":${r.getLong(3)}}""")
              .mkString("""{"results":[""", ",", "]}")
          case other => throw new IllegalArgumentException(s"bad mode: $other")
        }
    }
  }
}
