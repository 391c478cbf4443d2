package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/**
 * Differential fuzzer for the SHINGLE-index pair-set/cluster lifecycle —
 * the [[MoRFuzz]] protocol applied to [[graft.pipeline.PairMaintenance]]:
 * a seeded sequence of random edit / delete / add generations against one
 * maintained index, each generation refreshed INCREMENTALLY
 * (`incrementalClusters` over the previous generation's own outputs) and
 * compared pair-for-pair and label-for-label against a full
 * `ngramJaccardPairs` + `dedupClustersStar` recompute of the live corpus.
 * Between generations 2 and 3 the index COMPACTS, so the composition
 * surface covers: multi-segment histories, re-edited docs, deletes after
 * edits, clone-heavy batches (df-boundary crossings in both directions),
 * and a refresh that starts from a compacted seg-0 index with empty
 * tombstones — the places a single-delta differential spec can't reach.
 *
 * Exit 0 = every generation identical; any divergence prints both sides
 * and exits 1 (the `tools/fuzz_gate.py pairs` signal).
 *
 * Driver-side corpus state is deliberate (the MoRFuzz rationale): fuzz
 * corpora are sf0.001-sized resamples, and holding the alive map on the
 * driver is what lets the harness know the exact ground truth.
 */
object PairFuzz {
  private def h(x: Long): Long = {
    val a = x * 6364136223846793005L + 1442695040888963407L
    val b = (a ^ (a >>> 29)) * 0xbf58476d1ce4e5b9L
    ((b ^ (b >>> 32)) % 1000000007L + 1000000007L) % 1000000007L
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, seedStr) = args
    val seed = seedStr.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val P = graft.pipeline.PairMaintenance
    val D = graft.pipeline.Dedup
    val scratch = java.nio.file.Files.createTempDirectory("graft-pairfuzz").toString

    val m = scala.collection.mutable.LinkedHashMap[Long, String]()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .foreach(r => m(r.getLong(0)) = if (r.isNullAt(1)) "" else r.getString(1))

    def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
    def corpus: DataFrame = df(m.toSeq)
    def ids(xs: Seq[Long]): DataFrame = xs.toDF("doc_id")
    def tombDf(xs: Seq[(Long, Long)]): DataFrame = xs.toDF("doc_id", "before_seg")

    var dir = s"$scratch/shx0"
    P.writeShingleIndex(corpus, dir)
    var oldPairs = D.ngramJaccardPairs(corpus, k = 3, threshold = 0.5)
      .localCheckpoint(true)
    var oldCC = D.dedupClustersStar(corpus, oldPairs).localCheckpoint(true)
    val tombs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var segInDir = 0L // last segment present in `dir`

    var failures = 0
    def checkGen(gen: Int, newCC: DataFrame, newPairs: DataFrame): Unit = {
      val fullPairs = D.ngramJaccardPairs(corpus, k = 3, threshold = 0.5)
        .localCheckpoint(true)
      val fullCC = D.dedupClustersStar(corpus, fullPairs)
      def pairKey(p: DataFrame) = p.collect().map(r =>
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
      def ccKey(c: DataFrame) = c.select("doc_id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (gp, wp) = (pairKey(newPairs), pairKey(fullPairs))
      val (gc, wc) = (ccKey(newCC), ccKey(fullCC))
      if (gp != wp) {
        failures += 1
        System.err.println(s"[pairfuzz seed=$seed] gen $gen PAIRS diverged " +
          s"(inc=${gp.size}, full=${wp.size})")
        (gp.diff(wp) ++ wp.diff(gp)).take(8).foreach(d =>
          System.err.println(s"  diff: $d"))
      }
      if (gc != wc) {
        failures += 1
        System.err.println(s"[pairfuzz seed=$seed] gen $gen LABELS diverged " +
          s"(inc=${gc.size}, full=${wc.size})")
        (gc.diff(wc) ++ wc.diff(gc)).take(8).foreach(d =>
          System.err.println(s"  diff: $d"))
      }
      if (gp == wp && gc == wc)
        println(s"[pairfuzz seed=$seed] gen $gen ok " +
          s"(${wp.size} pairs, ${wc.size} labels)")
    }

    for (gen <- 1 to 3) {
      // generation 2→3 boundary: compact the maintained index (drop-in
      // seg-0 rewrite, tombstones reset) and continue refreshing on it
      if (gen == 3) {
        val cDir = s"$scratch/shx_compacted"
        P.compactShingleIndex(spark, dir, tombDf(tombs.toSeq), cDir)
        dir = cDir; segInDir = 0L; tombs.clear()
        println(s"[pairfuzz seed=$seed] compacted before gen 3")
      }
      val alive = m.keys.toSeq.sorted
      val edits = alive.filter(id => h(id * 31 + gen * 7 + seed) % 10 < 2)
        .map(id => (id, m(id) + s" e$gen fz${gen}x${h(id + gen) % 3}"))
      val editSet = edits.map(_._1).toSet
      val dels = alive.filter(id =>
        !editSet.contains(id) && h(id * 17 + gen * 13 + seed) % 10 == 7)
      val nAdds = (3 + h(gen * 101 + seed) % 5).toInt
      val adds = (0 until nAdds).map { i =>
        val id = 7000000L + gen * 10000L + i
        // half the adds clone an alive doc verbatim (jaccard-1 pairs and
        // gram-df boundary crossings), half carry fresh text
        val text =
          if (i % 2 == 0 && alive.nonEmpty)
            m(alive((h(id + seed) % alive.size).toInt))
          else s"fresh doc $gen $i " + Seq.tabulate(6)(j =>
            s"w${h(id * 7 + j) % 50}").mkString(" ")
        (id, text)
      }
      val changed = edits ++ adds
      val seg = segInDir + 1
      P.appendToShingleIndex(df(changed), dir, seg = seg)
      val tombsOld = tombs.toSeq
      tombs ++= edits.map { case (id, _) => (id, seg) }
      tombs ++= dels.map(id => (id, Long.MaxValue))
      edits.foreach { case (id, t) => m(id) = t }
      dels.foreach(m.remove)
      adds.foreach { case (id, t) => m(id) = t }

      val (newCC, newPairs) = P.incrementalClusters(spark, dir,
        oldPairs, oldCC,
        changedIds = ids(changed.map(_._1)),
        removedIds = ids(dels),
        tombstonesOld = tombDf(tombsOld),
        tombstonesNew = tombDf(tombs.toSeq),
        refreshSegFrom = seg)
      val ccPin = newCC.localCheckpoint(true)
      val pairsPin = newPairs.localCheckpoint(true)
      checkGen(gen, ccPin, pairsPin)
      // next generation consumes THIS generation's own outputs — the
      // closed-loop composition the one-shot differential spec can't see
      oldPairs = pairsPin
      oldCC = ccPin
      segInDir = seg
    }

    spark.stop()
    if (failures > 0) {
      System.err.println(s"[pairfuzz seed=$seed] $failures comparisons diverged")
      sys.exit(1)
    }
    println(s"[pairfuzz seed=$seed] all generations identical")
  }
}
