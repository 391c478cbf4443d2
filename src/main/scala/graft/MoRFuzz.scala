package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Differential fuzzer for the merge-on-read term-index LIFECYCLE: a seeded
 * sequence of random append / edit / delete batches against one index,
 * then every retrieval consumer (boolean AND / OR, BM25, exact phrase)
 * compared row-for-row — scores included — against a FRESH index built
 * over the final corpus state, and again after compaction. The r11 sweep
 * protocol (fresh boundaries every seed) applied to the composition
 * surface the single-delta p86/p92/p93 rows can't reach: multi-segment
 * histories, re-edited docs, deletes landing between edits, delta-only
 * terms, empty/whitespace/non-ASCII docs flowing through maintenance.
 *
 * Exit 0 = every comparison identical; any divergence prints both sides
 * and exits 1 (the gate signal `tools/fuzz_gate.py mor` consumes).
 *
 * Driver-side corpus state is deliberate: the fuzz corpora are
 * sf0.001-sized resamples (hundreds of docs — bounded by the harness,
 * not a scale path); holding the alive map on the driver is what lets
 * the harness know the exact rebuild ground truth.
 */
object MoRFuzz {
  private def h(x: Long): Long = {
    val a = x * 6364136223846793005L + 1442695040888963407L
    val b = (a ^ (a >>> 29)) * 0xbf58476d1ce4e5b9L
    ((b ^ (b >>> 32)) % 1000000007L + 1000000007L) % 1000000007L
  }

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^\\p{L}\\p{N}\\s]", " ")
      .split("\\s+").filter(_.nonEmpty).toSeq

  def main(args: Array[String]): Unit = {
    val Array(sfDir, seedStr) = args
    val seed = seedStr.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scratch = java.nio.file.Files.createTempDirectory("graft-morfuzz").toString
    val dir = s"$scratch/idx"

    // the evolving alive corpus, keyed by doc_id (deterministic order)
    val m = scala.collection.mutable.LinkedHashMap[Long, String]()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .foreach(r => m(r.getLong(0)) = if (r.isNullAt(1)) "" else r.getString(1))

    def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

    graft.pipeline.TextStats.writeTermIndex(df(m.toSeq), dir, buckets = 32)
    val tombs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()

    for (seg <- 1L to 4L) {
      val alive = m.keys.toSeq.sorted
      val edits = alive.filter(id => h(id * 31 + seg * 7 + seed) % 10 < 2)
        .map(id => (id, m(id) + s" e$seg fuzzterm$seg"))
      val editSet = edits.map(_._1).toSet
      val dels = alive.filter(id =>
        !editSet.contains(id) && h(id * 17 + seg * 13 + seed) % 10 == 7)
      val nAdds = (3 + h(seg * 101 + seed) % 5).toInt
      val adds = (0 until nAdds).map { i =>
        val id = 5000000L + seg * 10000L + i
        // half the adds clone an existing doc verbatim (tie/dup mass in
        // df and dl), half carry fresh delta-only terms
        val text =
          if (i % 2 == 0 && alive.nonEmpty)
            m(alive((h(id + seed) % alive.size).toInt))
          else s"added$seg alpha window added$seg scan merge uniq${seg}x$i"
        (id, text)
      }
      graft.pipeline.TextStats.appendToTermIndex(df(edits ++ adds), dir, seg = seg)
      tombs ++= edits.map { case (id, _) => (id, seg) }
      tombs ++= dels.map(id => (id, seg))
      edits.foreach { case (id, t) => m(id) = t }
      dels.foreach(m.remove)
      adds.foreach { case (id, t) => m(id) = t }
    }

    val tomb = tombs.toSeq.toDF("doc_id", "before_seg")
    val rebuilt = s"$scratch/rebuilt"
    graft.pipeline.TextStats.writeTermIndex(df(m.toSeq), rebuilt, buckets = 32)

    // query vocabulary from the FINAL corpus: frequent / mid / rare terms,
    // an absent term, and delta-only terms (fuzzterm2 exists only in seg-2
    // edit postings — the row that catches a dl/df lifecycle hole)
    val freq = scala.collection.mutable.HashMap[String, Long]()
    m.values.foreach(t => tokens(t).distinct.foreach(w =>
      freq(w) = freq.getOrElse(w, 0L) + 1L))
    val byFreq = freq.toSeq.sortBy { case (w, n) => (-n, w) }.map(_._1)
    val top1 = byFreq.headOption.getOrElse("alpha")
    val top2 = if (byFreq.size > 1) byFreq(1) else top1
    val mid = byFreq.lift(byFreq.size / 2).getOrElse(top1)
    val rare = byFreq.lastOption.getOrElse(top1)

    var failures = 0
    def check(name: String, got: DataFrame, want: DataFrame): Unit = {
      val g = got.collect().map(_.toString).sorted.toSeq
      val w = want.collect().map(_.toString).sorted.toSeq
      if (g != w) {
        failures += 1
        System.err.println(s"[morfuzz seed=$seed] $name DIVERGED")
        System.err.println(s"  mor    (${g.size}): ${g.take(8).mkString("; ")}")
        System.err.println(s"  rebuild(${w.size}): ${w.take(8).mkString("; ")}")
        (g.diff(w) ++ w.diff(g)).take(8).foreach(d =>
          System.err.println(s"  diff: $d"))
      } else println(s"[morfuzz seed=$seed] $name ok (${g.size} rows)")
    }

    val T = graft.pipeline.TextStats
    def andQ(d: String, tb: DataFrame) =
      T.searchTermIndexMoR(spark, d, tb, Seq(top1, mid), mode = "and")
    def orQ(d: String, tb: DataFrame) =
      T.searchTermIndexMoR(spark, d, tb, Seq(rare, "zzqxvnope"), mode = "or")
    def deltaQ(d: String, tb: DataFrame) =
      T.searchTermIndexMoR(spark, d, tb, Seq(top1, "fuzzterm2"), mode = "and")
    def bmQ(d: String, tb: Option[DataFrame]) =
      T.bm25TopK(spark, d, Seq(top1, mid, rare), k = 20, tombstones = tb)
    def bmDeltaQ(d: String, tb: Option[DataFrame]) =
      T.bm25TopK(spark, d, Seq("fuzzterm3", top2, "added4"), k = 20, tombstones = tb)
    def phQ(d: String, tb: Option[DataFrame]) =
      T.phraseSearch(spark, d, Seq("e2", "fuzzterm2"), tombstones = tb)
    def ph3Q(d: String, tb: Option[DataFrame]) =
      T.phraseSearch(spark, d, Seq("added4", "alpha", "window"), tombstones = tb)
    // prefix family: "fuzzterm" prefixes every edit segment's marker term,
    // so the alive set spans all four segments under the tombstones
    def preQ(d: String, tb: Option[DataFrame]) =
      T.prefixSearchTermIndex(spark, d, "fuzzterm", tombstones = tb)

    val noTomb = Seq.empty[(Long, Long)].toDF("doc_id", "before_seg")
    check("boolean AND", andQ(dir, tomb), andQ(rebuilt, noTomb))
    check("boolean OR", orQ(dir, tomb), orQ(rebuilt, noTomb))
    check("boolean AND delta-term", deltaQ(dir, tomb), deltaQ(rebuilt, noTomb))
    check("bm25 top-20", bmQ(dir, Some(tomb)), bmQ(rebuilt, None))
    check("bm25 delta-terms", bmDeltaQ(dir, Some(tomb)), bmDeltaQ(rebuilt, None))
    check("phrase edit-suffix", phQ(dir, Some(tomb)), phQ(rebuilt, None))
    check("phrase added-doc", ph3Q(dir, Some(tomb)), ph3Q(rebuilt, None))
    check("prefix fuzzterm*", preQ(dir, Some(tomb)), preQ(rebuilt, None))

    // the janitor: compacted output must be a drop-in with EMPTY tombstones
    val compacted = s"$scratch/compacted"
    T.compactTermIndex(spark, dir, tomb, compacted)
    check("compacted AND", andQ(compacted, noTomb), andQ(rebuilt, noTomb))
    check("compacted bm25", bmQ(compacted, None), bmQ(rebuilt, None))
    check("compacted phrase", phQ(compacted, None), phQ(rebuilt, None))
    check("compacted prefix", preQ(compacted, None), preQ(rebuilt, None))

    spark.stop()
    if (failures > 0) {
      System.err.println(s"[morfuzz seed=$seed] $failures comparisons diverged")
      sys.exit(1)
    }
    println(s"[morfuzz seed=$seed] all comparisons identical")
  }
}
