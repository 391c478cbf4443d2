package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.api.SearchApi

/** End-to-end retrieval serving: real server over PERSISTED artifacts only
  * (term index + sidecars, IVF-PQ index + codebooks built once in
  * beforeAll, like a deployment's artifact mount) — every route's body
  * must equal the direct engine call it serves. */
class SearchApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var api: SearchApi = _
  private var port: Int = _
  private var tiDir: String = _
  private var ivfDir: String = _
  private var cbDir: String = _
  private val client = HttpClient.newHttpClient()
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-serve").toString
    tiDir = s"$root/ti"; ivfDir = s"$root/ivf"; cbDir = s"$root/cb"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    graft.pipeline.TextStats.writeTermIndex(docs, tiDir)
    val cents = graft.pipeline.Similarity.trainCentroids(emb, nlist = 8, iters = 3, sampleN = 2000)
    val cb = graft.pipeline.Quantize.trainPqCodebooks(emb, m = 16, ksub = 16, iters = 10, sampleN = 2000)
    graft.pipeline.Similarity.writeIndex(
      graft.pipeline.Quantize.pqEncode(
        graft.pipeline.Similarity.assignCells(emb, cents), cb), cents, ivfDir)
    graft.pipeline.Quantize.writeCodebooks(spark, cb, cbDir)
    api = new SearchApi(spark, tiDir, ivfDir, cbDir, port = 0)
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

  test("/search bm25 equals the direct bm25TopK call over the same artifacts") {
    val (code, body) = get("/search?q=window+scan+merge&k=5")
    assert(code == 200, body)
    val direct = graft.pipeline.TextStats
      .bm25TopK(spark, tiDir, Seq("window", "scan", "merge"), k = 5).collect()
      .map(r => s"""{"doc_id":${r.getLong(0)},"n_terms":${r.getLong(1)},"score":${r.getDouble(2)}}""")
      .mkString("""{"results":[""", ",", "]}")
    assert(body == direct, s"served $body vs direct $direct")
  }

  test("/search phrase equals the direct phraseSearch call") {
    val (code, body) = get("/search?phrase=table+scan+merge&k=100")
    assert(code == 200, body)
    import org.apache.spark.sql.functions.desc
    val direct = graft.pipeline.TextStats
      .phraseSearch(spark, tiDir, Seq("table", "scan", "merge"))
      .orderBy(desc("n_occur"), col("doc_id")).limit(100).collect()
      .map(r => s"""{"doc_id":${r.getLong(0)},"n_occur":${r.getLong(1)}}""")
      .mkString("""{"results":[""", ",", "]}")
    assert(body == direct)
    assert(body.contains("\"doc_id\""), s"phrase must hit at sf0.001: $body")
  }

  test("/search hybrid fuses the BM25 and IVF-PQ arms from artifacts and matches the direct composition") {
    // query vector = embedding 7 (the p88 convention), shipped as the
    // request payload like a real encoder-in-front deployment
    val qv = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") === 7L).select("embedding")
      .head().getSeq[Float](0).toArray
    val vecParam = qv.map(_.toString).mkString(",")
    val t0 = System.nanoTime()
    val (code, body) = get(s"/search?q=window+scan+merge&mode=hybrid&k=10&vec=$vecParam")
    val latencyMs = (System.nanoTime() - t0) / 1e6
    assert(code == 200, body)
    val direct = graft.pipeline.Similarity.hybridServeTopK(spark, tiDir,
        Seq("window", "scan", "merge"), ivfDir, cbDir, qv, k = 10).collect()
      .map(r => s"""{"doc_id":${r.getLong(0)},"bm_rank":${r.getLong(1)},"ann_rank":${r.getLong(2)},"rrf_x1e6":${r.getLong(3)}}""")
      .mkString("""{"results":[""", ",", "]}")
    assert(body == direct, s"served $body vs direct $direct")
    // both arms must contribute somewhere in the fused list
    assert(body.contains("\"bm_rank\":") && !body.contains("\"results\":[]"))
    info(f"hybrid request latency: $latencyMs%.0f ms (sf0.001, cold plans)")
  }

  test("/search glob equals the direct globSearchTermIndex call") {
    val (code, body) = get("/search?glob=sc%5Bae%5Dn*&k=100")
    assert(code == 200, body)
    import org.apache.spark.sql.functions.desc
    val direct = graft.pipeline.TextStats
      .globSearchTermIndex(spark, tiDir, "sc[ae]n*")
      .orderBy(desc("n_hits"), col("doc_id")).limit(100).collect()
      .map(r => s"""{"doc_id":${r.getLong(0)},"n_terms":${r.getLong(1)},"n_hits":${r.getLong(2)}}""")
      .mkString("""{"results":[""", ",", "]}")
    assert(body == direct)
    assert(body.contains("\"doc_id\""), s"glob must hit at sf0.001: $body")
  }

  test("errors are 400 with a JSON body; /lb_check stays up") {
    assert(get("/search?k=5")._1 == 400)
    assert(get("/search?q=a&mode=bogus")._1 == 400)
    assert(get("/search?q=a&mode=hybrid")._1 == 400) // missing vec
    val (c, b) = get("/lb_check")
    assert(c == 200 && b == "Ok\n")
  }
}
