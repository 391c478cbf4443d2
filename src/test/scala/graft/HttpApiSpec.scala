package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.api.HttpApi
import graft.store.EventSeriesStore

/** End-to-end HTTP: real server, real store, graphite-web route shapes. */
class HttpApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var api: HttpApi = _
  private var port: Int = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    api = new HttpApi(spark, new EventSeriesStore("/root/testdata/sf0.001"), port = 0)
    port = api.start()
  }
  override def afterAll(): Unit = {
    if (api != null) api.stop()
    if (spark != null) spark.stop()
  }

  private def get(pathAndQuery: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("/render json returns datapoints for a real target") {
    val (code, body) = get("/render?target=sumSeries(events.*)&from=1704067200&until=1706660000")
    assert(code == 200)
    assert(body.contains("\"target\":\"sumSeries(events.*)\""))
    assert(body.contains("\"datapoints\":[["))
  }

  test("/render csv format") {
    val (code, body) = get("/render?target=events.click&from=1704067200&until=1706660000&format=csv")
    assert(code == 200)
    assert(body.startsWith("\"events.click\",2024-01-0"))
  }

  test("/render without target is a 400") {
    assert(get("/render")._1 == 400)
  }

  test("/metrics/find treejson and completer") {
    val (code, body) = get("/metrics/find?query=events.*")
    assert(code == 200)
    assert(body.contains("\"id\":\"events.click\"") && body.contains("\"leaf\":1"))
    val (_, completer) = get("/metrics/find?query=events.*&format=completer")
    assert(completer.contains("\"is_leaf\":\"1\""))
  }

  test("/metrics/expand lists matching paths") {
    val (code, body) = get("/metrics/expand?query=events.*")
    assert(code == 200)
    assert(body.contains("\"events.view\""))
  }

  test("/tags autocomplete") {
    val (code, body) = get("/tags/autoComplete/tags")
    assert(code == 200 && body.contains("\"name\""))
    val (c2, vals) = get("/tags/autoComplete/values?tag=name&valuePrefix=events.c")
    assert(c2 == 200 && vals.contains("\"events.click\""))
  }

  test("/functions, /version, /lb_check") {
    val (c, body) = get("/functions")
    assert(c == 200 && body.contains("\"sumSeries\""))
    assert(get("/version")._1 == 200)
    assert(get("/lb_check")._2 == "Ok\n")
  }
}
