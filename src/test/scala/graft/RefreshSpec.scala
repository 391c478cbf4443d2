package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dedup, PairMaintenance, Quantize, Refresh, Similarity, TextStats}

/**
 * The corpus-refresh orchestrator's coherence gates: ONE delta through
 * [[Refresh.refreshCorpus]] must leave EVERY artifact equal to its
 * full-rebuild twin — term retrieval, ANN serving, near-dup pairs and
 * cluster labels — and the cross-artifact consistency invariant must hold
 * on the orchestrated set and FAIL on a deliberately skewed one (a doc
 * edited in the term index but not re-embedded). The BM25 consumer is
 * additionally DuckDB-oracle-gated as catalog rows p98/p99.
 */
class RefreshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private var root: String = _
  private var report: Refresh.RefreshReport = _
  private var corpus0: DataFrame = _   // (doc_id, text, embedding), build state
  private var refreshed: DataFrame = _ // the post-delta truth

  private def delta(d: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val edited = d.where(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0)
      .withColumn("text", concat(col("text"), lit(" rev2")))
      .withColumn("embedding",
        transform(col("embedding"), x => (x * lit(1.5f)).cast("float")))
    val added = d.where(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("embedding",
        transform(col("embedding"), x => (x + lit(0.25f)).cast("float")))
    val removed = d.where(col("doc_id") % 7 === 0).select("doc_id")
    (edited, added, removed)
  }

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    corpus0 = docs.join(emb, "doc_id").select("doc_id", "text", "embedding")
      .localCheckpoint(true)
    root = java.nio.file.Files.createTempDirectory("graft-refresh").toString + "/a"
    Refresh.buildAll(spark, corpus0.select("doc_id", "text"),
      corpus0.select(col("doc_id").as("vec_id"), col("embedding")), root,
      nlist = 8, m = 16, ksub = 16, trainIters = 3, sampleN = 2000)
    val (edited, added, removed) = delta(corpus0)
    report = Refresh.refreshCorpus(spark, root, edited, added, removed)
    refreshed = corpus0.where(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 =!= 0)
      .unionByName(edited).unionByName(added).localCheckpoint(true)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def a = report.artifacts

  test("one delta, all consumers: BM25 + phrase over the orchestrated term artifacts equal a full rebuild on the refreshed corpus") {
    assert(report.seg == 1L)
    val tomb = spark.read.parquet(a.termTombstonesPath)
    val rebuilt = java.nio.file.Files.createTempDirectory("refresh-ti").toString
    TextStats.writeTermIndex(refreshed.select("doc_id", "text"), rebuilt)
    def rows(df: DataFrame) = df.collect().map(_.toString).toList
    assert(
      rows(TextStats.bm25TopK(spark, a.termIndexDir,
        Seq("window", "scan", "merge"), k = 10, tombstones = Some(tomb))) ==
      rows(TextStats.bm25TopK(spark, rebuilt,
        Seq("window", "scan", "merge"), k = 10)),
      "orchestrated BM25 must equal the full-rebuild truth")
    assert(
      rows(TextStats.phraseSearch(spark, a.termIndexDir,
        Seq("table", "scan", "merge"), tombstones = Some(tomb))
        .orderBy("doc_id")) ==
      rows(TextStats.phraseSearch(spark, rebuilt,
        Seq("table", "scan", "merge")).orderBy("doc_id")),
      "orchestrated phrase search must equal the full-rebuild truth")
  }

  test("one delta, ANN: the orchestrated IVF serve equals a same-quantizer re-encode of the refreshed vectors") {
    val tomb = spark.read.parquet(a.ivfTombstonesPath)
    val (idx, cents) = Similarity.readIndex(spark, a.ivfPath)
    val cb = Quantize.readCodebooks(spark, s"${a.ivfPath}/codebooks")
    val vecs = refreshed.select(col("doc_id").as("vec_id"), col("embedding"))
    val reDir = java.nio.file.Files.createTempDirectory("refresh-ivf").toString
    Similarity.writeIndex(
      Quantize.pqEncode(Similarity.assignCells(vecs, cents), cb), cents, reDir)
    val (reIdx, reCents) = Similarity.readIndex(spark, reDir)
    val queries = vecs.where(col("vec_id") < 12 || col("vec_id") >= 1000000L)
      .limit(8)
    def key(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(3),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(
      key(Similarity.ivfPqTopK(idx, queries, cb, cents, k = 5, nprobe = 4,
        shortlist = 50, tombstones = Some(tomb))) ==
      key(Similarity.ivfPqTopK(reIdx, queries, cb, reCents, k = 5, nprobe = 4,
        shortlist = 50)),
      "orchestrated ANN serve must equal the same-quantizer re-encode")
  }

  test("one delta, dedup: the orchestrated pairs + cluster labels equal a full recompute on the refreshed corpus") {
    val pairs = spark.read.parquet(a.pairsPath(report.seg))
    val cc = spark.read.parquet(a.clustersPath(report.seg))
    val truthPairs = Dedup.ngramJaccardPairs(
      refreshed.select("doc_id", "text"), k = 3, threshold = 0.5)
    def pk(df: DataFrame) = df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pk(pairs) == pk(truthPairs),
      "orchestrated pair set must equal the full recompute")
    val truthCC = Dedup.dedupClustersStar(refreshed.select("doc_id", "text"),
      truthPairs)
    def ck(df: DataFrame) = df.select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ck(cc) == ck(truthCC),
      "orchestrated cluster labels must equal the full recompute")
  }

  test("the manifest witnesses the refresh and the tombstone fingerprints correspond across artifacts") {
    val m = spark.read.parquet(a.manifestPath).orderBy("seg").collect()
    assert(m.map(_.getLong(0)).toSeq == Seq(0L, 1L), m.mkString(","))
    val last = m.last
    assert(last.getLong(1) > 0 && last.getLong(2) > 0 && last.getLong(3) > 0,
      "refresh row must carry the delta counts")
    // the invariant the manifest records: equal term/ivf tombstone
    // fingerprints (same delta, same before_seg payload)
    assert(last.getLong(5) == last.getLong(6),
      "term and ivf tombstone fingerprints must be equal")
    assert(Refresh.tombstoneFingerprint(
        spark.read.parquet(a.termTombstonesPath)) ==
      Refresh.tombstoneFingerprint(spark.read.parquet(a.ivfTombstonesPath)))
  }

  test("/status over the orchestrated artifact set reads consistent:true; a term/IVF refresh skew reads consistent:false") {
    val api = new graft.api.SearchApi(spark, a.termIndexDir, a.ivfPath,
      port = 0, termTombstonesPath = Some(a.termTombstonesPath),
      ivfTombstonesPath = Some(a.ivfTombstonesPath))
    val port = api.start()
    try {
      val body = new String(java.net.URI.create(
        s"http://127.0.0.1:$port/status").toURL.openStream().readAllBytes())
      assert(body.contains("\"consistent\":true"), body)
    } finally api.stop()

    // the skew: the term side saw the refresh, the IVF side claims a
    // DIFFERENT tombstone history (one extra edit never re-embedded) —
    // /status must surface it
    val skewDir = java.nio.file.Files.createTempDirectory("refresh-skew").toString
    val sp = spark
    import sp.implicits._
    spark.read.parquet(a.ivfTombstonesPath)
      .unionByName(Seq((424242L, 1L)).toDF("vec_id", "before_seg"))
      .write.mode("overwrite").parquet(skewDir)
    val api2 = new graft.api.SearchApi(spark, a.termIndexDir, a.ivfPath,
      port = 0, termTombstonesPath = Some(a.termTombstonesPath),
      ivfTombstonesPath = Some(skewDir))
    val port2 = api2.start()
    try {
      val body = new String(java.net.URI.create(
        s"http://127.0.0.1:$port2/status").toURL.openStream().readAllBytes())
      assert(body.contains("\"consistent\":false"), body)
    } finally api2.stop()
  }

  test("an out-of-band single-index append makes the next orchestrated refresh REFUSE (segment-skew precondition)") {
    // clone the artifact root, then bump ONLY the term index
    val root2 = java.nio.file.Files.createTempDirectory("refresh-oob").toString + "/b"
    val a2 = Refresh.CorpusArtifacts(root2)
    def cp(from: String, to: String): Unit = {
      val src = java.nio.file.Paths.get(from)
      if (!java.nio.file.Files.exists(src)) return
      val dst = java.nio.file.Paths.get(to)
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else {
          java.nio.file.Files.createDirectories(t.getParent)
          java.nio.file.Files.copy(p, t)
        }
      }
    }
    for (sub <- Seq("term_index", "term_index.doclen", "term_index.meta",
        "shingle_index", "shingle_index.sizes", "shingle_index.meta", "ivf",
        "term_tombstones", "ivf_tombstones", "shingle_tombstones", "pairs",
        "clusters", "manifest"))
      cp(s"$root/$sub", s"$root2/$sub")
    TextStats.appendToTermIndex(
      refreshed.select("doc_id", "text").limit(3), a2.termIndexDir, seg = 2L)
    val (edited, added, removed) = delta(refreshed)
    val ex = intercept[IllegalArgumentException] {
      Refresh.refreshCorpus(spark, root2, edited, added, removed)
    }
    assert(ex.getMessage.contains("segment skew"), ex.getMessage)
  }

  test("consolidate: every consumer over the fresh root equals the refreshed-corpus truth with ZERO tombstone configuration") {
    val outRoot = java.nio.file.Files.createTempDirectory("refresh-cons").toString + "/c"
    val out = Refresh.consolidate(spark, root, outRoot,
      nlist = 8, m = 16, ksub = 16, trainIters = 3, sampleN = 2000)
    val rebuilt = java.nio.file.Files.createTempDirectory("refresh-ti2").toString
    TextStats.writeTermIndex(refreshed.select("doc_id", "text"), rebuilt)
    def rows(df: DataFrame) = df.collect().map(_.toString).toList
    assert(
      rows(TextStats.bm25TopK(spark, out.termIndexDir,
        Seq("window", "scan", "merge"), k = 10)) ==
      rows(TextStats.bm25TopK(spark, rebuilt,
        Seq("window", "scan", "merge"), k = 10)),
      "consolidated BM25 must equal the full-rebuild truth, no tombstones")
    // tombstone tables are present and EMPTY (a serving mount needs them)
    assert(spark.read.parquet(out.termTombstonesPath).count() == 0L)
    assert(spark.read.parquet(out.ivfTombstonesPath).count() == 0L)
    // the consolidated IVF dir is self-contained: a SearchApi mount with
    // zero extra configuration starts and reports a clean seg-0 state
    val api = new graft.api.SearchApi(spark, out.termIndexDir, out.ivfPath,
      port = 0)
    val port = api.start()
    try {
      val body = new String(java.net.URI.create(
        s"http://127.0.0.1:$port/status").toURL.openStream().readAllBytes())
      assert(body.contains("\"consistent\":true"), body)
      assert(body.contains("\"segments\":[0]"), body)
    } finally api.stop()
    // pairs/clusters carried over as version 0 of the new root
    assert(spark.read.parquet(out.pairsPath(0L)).count() ==
      spark.read.parquet(a.pairsPath(report.seg)).count())
    // a further orchestrated refresh lands on the consolidated root
    val (e2, ad2, rm2) = delta(refreshed)
    val r2 = Refresh.refreshCorpus(spark, outRoot, e2, ad2, rm2)
    assert(r2.seg == 1L)
  }
}
