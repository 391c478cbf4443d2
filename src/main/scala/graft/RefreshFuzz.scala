package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Cross-index closed-loop differential fuzzer for the corpus-refresh
 * ORCHESTRATOR — the composition gate the three per-index fuzzers
 * ([[MoRFuzz]] term, [[PairFuzz]] shingle, [[VecFuzz]] IVF) can't express:
 * one seeded random delta stream drives ALL artifacts through
 * [[graft.pipeline.Refresh.refreshCorpus]] each generation, and the
 * comparison runs END TO END through `/search` — a [[graft.api.SearchApi]]
 * mounted on the maintained artifact set must answer every route (bm25,
 * phrase, complete, hybrid) byte-identically to a SearchApi mounted on a
 * FULL REBUILD of the current corpus state (term index rebuilt from text;
 * IVF re-encoded under the maintained root's own quantizers — assignment
 * and PQ encoding are deterministic, so hybrid must match exactly too).
 * `/status` must read consistent:true every generation. Generation 3 runs
 * after [[graft.pipeline.Refresh.consolidate]], so the janitor's output is
 * fuzzed as a refresh base, not just served once.
 *
 * Docs without a resampled embedding get a deterministic hash-derived
 * vector, so the pathological text corners (empty/whitespace docs) stay in
 * the orchestrated corpus instead of being joined away.
 *
 * Exit 0 = every comparison identical; divergence prints both sides and
 * exits 1 (the `tools/fuzz_gate.py refresh` signal). Driver-side corpus
 * state is deliberate — the MoRFuzz rationale.
 */
object RefreshFuzz {
  private def h(x: Long): Long = {
    val a = x * 6364136223846793005L + 1442695040888963407L
    val b = (a ^ (a >>> 29)) * 0xbf58476d1ce4e5b9L
    ((b ^ (b >>> 32)) % 1000000007L + 1000000007L) % 1000000007L
  }

  private val DIM = 64

  private def pseudoVec(id: Long): Array[Float] =
    Array.tabulate(DIM)(i => (h(id * 131 + i) % 2000 - 1000) / 1000.0f)

  def main(args: Array[String]): Unit = {
    val Array(sfDir, seedStr) = args
    val seed = seedStr.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val R = graft.pipeline.Refresh
    val T = graft.pipeline.TextStats
    val S = graft.pipeline.Similarity
    val Q = graft.pipeline.Quantize
    val scratch = java.nio.file.Files.createTempDirectory("graft-refreshfuzz").toString

    // the evolving corpus: doc_id -> (text, embedding)
    val m = scala.collection.mutable.LinkedHashMap[Long, (String, Array[Float])]()
    val embById = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .foreach { r =>
        val id = r.getLong(0)
        m(id) = (Option(r.getString(1)).getOrElse(""),
          embById.getOrElse(id, pseudoVec(id)))
      }
    require(m.nonEmpty, "refreshfuzz: empty documents corpus")

    def df(rows: Seq[(Long, (String, Array[Float]))]): DataFrame =
      rows.map { case (id, (t, v)) => (id, t, v.toSeq) }
        .toDF("doc_id", "text", "embedding")
    def corpusDf: DataFrame = df(m.toSeq)

    var root = s"$scratch/r0"
    R.buildAll(spark, corpusDf.select("doc_id", "text"),
      corpusDf.select(col("doc_id").as("vec_id"), col("embedding")), root,
      nlist = 8, m = 16, ksub = 16, trainIters = 3, sampleN = 2000)
    // ids removed in EARLIER generations — later adds resurrect some of
    // them (the tombstone-must-cap-at-its-segment corner: a re-added doc
    // must rank again in every consumer)
    val removedEver = scala.collection.mutable.ArrayBuffer[Long]()

    val client = java.net.http.HttpClient.newHttpClient()
    def get(port: Int, pq: String): (Int, String) = {
      val resp = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$pq")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }

    var failures = 0
    def check(gen: Int): Unit = {
      val a = R.CorpusArtifacts(root)
      // the rebuilt world: fresh term index from text; IVF re-encoded
      // under the MAINTAINED root's own quantizers (deterministic — the
      // hybrid arm must therefore match exactly, not approximately)
      val reRoot = s"$scratch/re_$gen"
      T.writeTermIndex(corpusDf.select("doc_id", "text"), s"$reRoot/term_index")
      val (_, cents) = S.readIndex(spark, a.ivfPath)
      val cb = Q.readCodebooks(spark, s"${a.ivfPath}/codebooks")
      S.writeIndex(Q.pqEncode(S.assignCells(
          corpusDf.select(col("doc_id").as("vec_id"), col("embedding")), cents), cb),
        cents, s"$reRoot/ivf")
      Q.writeCodebooks(spark, cb, s"$reRoot/ivf/codebooks")
      S.writeIndexMeta(spark, s"$reRoot/ivf", cb)

      val maintained = new graft.api.SearchApi(spark, a.termIndexDir,
        a.ivfPath, port = 0,
        termTombstonesPath = Some(a.termTombstonesPath),
        ivfTombstonesPath = Some(a.ivfTombstonesPath))
      val rebuilt = new graft.api.SearchApi(spark, s"$reRoot/term_index",
        s"$reRoot/ivf", port = 0)
      val pM = maintained.start()
      val pR = rebuilt.start()
      try {
        // query material: fixed corpus terms + words from a seed-picked
        // alive doc, and that doc's CURRENT embedding for the hybrid arm
        val alive = m.keys.toSeq.sorted
        val pick = alive((h(gen * 37 + seed) % alive.size).toInt)
        // URL-safe query words only — the corpus carries punctuation and
        // non-ASCII corners that belong in the INDEX, not in the URI
        val words = m(pick)._1.toLowerCase.split("\\s+")
          .filter(_.matches("[a-z0-9]{2,}")).take(2)
        val qv = m(pick)._2.map(_.toString).mkString(",")
        val reqs = Seq(
          "/search?q=window+scan+merge&k=10",
          if (words.nonEmpty) s"/search?q=${words.mkString("+")}&k=10"
          else "/search?q=window&k=10",
          "/search?phrase=table+scan+merge&k=50",
          "/search?complete=sc&k=8",
          s"/search?q=window+scan+merge&mode=hybrid&k=10&vec=$qv")
        reqs.foreach { r =>
          val got = get(pM, r)
          val want = get(pR, r)
          if (got != want) {
            failures += 1
            System.err.println(s"[refreshfuzz seed=$seed] gen $gen DIVERGED on $r")
            System.err.println(s"  maintained: ${got.toString.take(500)}")
            System.err.println(s"  rebuilt:    ${want.toString.take(500)}")
          }
        }
        val (sc, status) = get(pM, "/status")
        if (sc != 200 || !status.contains("\"consistent\":true")) {
          failures += 1
          System.err.println(s"[refreshfuzz seed=$seed] gen $gen /status " +
            s"not consistent: $status")
        }
        if (failures == 0)
          println(s"[refreshfuzz seed=$seed] gen $gen ok (${reqs.size} routes + /status)")
      } finally { maintained.stop(); rebuilt.stop() }
    }

    for (gen <- 1 to 3) {
      if (gen == 3) {
        // the janitor mid-history: consolidate into a fresh root (compact
        // or measured retrain), then keep refreshing ON the consolidated set
        val cRoot = s"$scratch/rc"
        R.consolidate(spark, root, cRoot,
          nlist = 8, m = 16, ksub = 16, trainIters = 3, sampleN = 2000)
        root = cRoot
        check(gen)
      }
      val alive = m.keys.toSeq.sorted
      val editIds = alive.filter(id => h(id * 31 + gen * 7 + seed) % 10 < 2)
      val edits = editIds.map { id =>
        val (t, v) = m(id)
        val nt = if (h(id + gen) % 4 == 0) "" // text can empty out
          else t + s" rev$gen word${h(id * 3 + gen) % 50}"
        val nv = v.zipWithIndex.map { case (x, i) =>
          if ((i + (h(id * 13 + gen) % DIM).toInt) % 3 == 0) -1.5f * x else 0.7f * x }
        (id, (nt, nv))
      }
      val editSet = editIds.toSet
      val dels = alive.filter(id =>
        !editSet.contains(id) && h(id * 17 + gen * 13 + seed) % 10 == 7)
      val nAdds = (3 + h(gen * 101 + seed) % 5).toInt
      val adds = (0 until nAdds).map { i =>
        val id =
          if (i % 3 == 1 && removedEver.nonEmpty) // RE-ADD a removed id
            removedEver((h(gen * 7 + i + seed) % removedEver.size).toInt)
          else 9000000L + gen * 10000L + i
        val payload =
          if (i % 2 == 0 && alive.nonEmpty) // exact clone: dup/tie mass
            m(alive((h(id + seed) % alive.size).toInt))
          else (s"fresh doc $id words scan merge window tie",
            pseudoVec(id * 7 + gen))
        (id, payload)
      }.distinctBy(_._1).filterNot { case (id, _) => m.contains(id) }
      R.refreshCorpus(spark, root, edited = df(edits), added = df(adds),
        removedIds = dels.toDF("doc_id"))
      removedEver ++= dels
      removedEver --= adds.map(_._1)
      edits.foreach { case (id, p) => m(id) = p }
      dels.foreach(m.remove)
      adds.foreach { case (id, p) => m(id) = p }
      check(gen)
    }

    spark.stop()
    if (failures > 0) {
      System.err.println(s"[refreshfuzz seed=$seed] $failures comparisons diverged")
      sys.exit(1)
    }
    println(s"[refreshfuzz seed=$seed] all comparisons identical")
  }
}
