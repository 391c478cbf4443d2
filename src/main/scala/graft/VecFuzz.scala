package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/**
 * Differential fuzzer for the IVF-PQ vector-index merge-on-read
 * lifecycle — the third leg of the [[MoRFuzz]] (term index) /
 * [[PairFuzz]] (shingle index) triangle: a seeded sequence of random
 * re-embed / delete / add segments against one maintained index, the
 * tombstone-aware serve compared row-for-row (ids, ranks, exact rerank
 * distances) against a fresh re-encode of the live corpus under the SAME
 * centroids/codebooks — assignment and PQ encoding are deterministic
 * functions of (vector, quantizers), so the MoR answer must be EXACTLY
 * the rebuild answer, not merely close. Checked again after compaction
 * (empty tombstones) and after one more segment on the compacted index.
 *
 * Covers what the deterministic PipelineSpec lifecycle gate can't: random
 * multi-segment histories, vectors re-embedded twice, deletes landing
 * after edits, adds that are exact clones of alive vectors (rank-tie
 * mass), adds later edited or deleted, and a zero vector flowing through
 * assign/encode/serve.
 *
 * Exit 0 = every comparison identical; divergence prints both sides and
 * exits 1 (the `tools/fuzz_gate.py ivf` signal). Driver-side corpus state
 * is deliberate — the MoRFuzz rationale.
 */
object VecFuzz {
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

    val S = graft.pipeline.Similarity
    val Q = graft.pipeline.Quantize
    val scratch = java.nio.file.Files.createTempDirectory("graft-vecfuzz").toString

    // the evolving alive corpus: vec_id -> (embedding, label)
    val m = scala.collection.mutable.LinkedHashMap[Long, (Array[Float], Int)]()
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .foreach(r => m(r.getLong(0)) =
        (r.getSeq[Float](1).toArray, r.getInt(2)))
    require(m.nonEmpty, "vecfuzz: empty embeddings corpus")
    val dim = m.head._2._1.length

    def df(rows: Seq[(Long, (Array[Float], Int))]): DataFrame =
      rows.map { case (id, (v, l)) => (id, v.toSeq, l) }
        .toDF("vec_id", "embedding", "label")
    def corpus: DataFrame = df(m.toSeq)

    // quantizers train ONCE on the initial corpus (the add-after-train
    // contract): every append must assign against these, never retrain
    val cents = S.trainCentroids(corpus, nlist = 8, iters = 3, sampleN = 2000)
    val cb = Q.trainPqCodebooks(corpus, m = 16, ksub = 16, iters = 5, sampleN = 2000)

    var dir = s"$scratch/ivf0"
    S.writeIndex(Q.pqEncode(S.assignCells(corpus, cents), cb), cents, dir)
    val tombs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var segInDir = 0L

    // deterministic re-embedding: flip sign on a seeded stride and scale —
    // moves vectors across cells without RNG
    def perturb(v: Array[Float], id: Long, gen: Long): Array[Float] = {
      val k = (h(id * 13 + gen) % dim).toInt
      v.zipWithIndex.map { case (x, i) =>
        if ((i + k) % 3 == 0) -1.5f * x else 0.7f * x }
    }

    var failures = 0
    def serve(d: String, tb: Option[DataFrame], queries: DataFrame): Set[(Long, Long, Int, Long)] = {
      val (idx, dc) = S.readIndex(spark, d)
      S.ivfPqTopK(idx, queries, cb, dc, k = 5, nprobe = 4, shortlist = 50,
          tombstones = tb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3),
          math.round(r.getDouble(2) * 1e6))).toSet
    }
    def check(gen: Int, label: String, tb: Option[DataFrame]): Unit = {
      // queries: first 6 alive ids, served with their CURRENT embedding
      val qids = m.keys.take(6).toSeq
      val queries = df(qids.map(id => (id, m(id))))
      val got = serve(dir, tb, queries)
      val reDir = s"$scratch/re_${gen}_${label.replaceAll("[^a-z0-9]", "_")}"
      S.writeIndex(Q.pqEncode(S.assignCells(corpus, cents), cb), cents, reDir)
      val want = serve(reDir, None, queries)
      if (got != want) {
        failures += 1
        System.err.println(s"[vecfuzz seed=$seed] gen $gen $label DIVERGED " +
          s"(mor=${got.size}, rebuild=${want.size})")
        (got.diff(want) ++ want.diff(got)).take(8).foreach(x =>
          System.err.println(s"  diff: $x"))
      } else println(s"[vecfuzz seed=$seed] gen $gen $label ok (${want.size} rows)")
    }

    for (gen <- 1 to 3) {
      if (gen == 3) {
        // the janitor mid-history: compacted index is a drop-in with
        // empty tombstones, and further segments append onto it
        val cDir = s"$scratch/ivf_compacted"
        S.compactIvfIndex(spark, dir, tombs.toSeq.toDF("vec_id", "before_seg"), cDir)
        dir = cDir; segInDir = 0L; tombs.clear()
        check(gen, "post-compaction", None)
      }
      val alive = m.keys.toSeq.sorted
      val edits = alive.filter(id => h(id * 31 + gen * 7 + seed) % 10 < 2)
        .map(id => (id, (perturb(m(id)._1, id, gen), m(id)._2)))
      val editSet = edits.map(_._1).toSet
      val dels = alive.filter(id =>
        !editSet.contains(id) && h(id * 17 + gen * 13 + seed) % 10 == 7)
      val nAdds = (3 + h(gen * 101 + seed) % 5).toInt
      val adds = (0 until nAdds).map { i =>
        val id = 9000000L + gen * 10000L + i
        val payload =
          if (i == 0 && gen == 1) (Array.fill(dim)(0.0f), 0) // zero-vector edge
          else if (i % 2 == 0 && alive.nonEmpty) // exact clone: rank-tie mass
            m(alive((h(id + seed) % alive.size).toInt))
          else (perturb(m(alive((h(id * 3 + seed) % alive.size).toInt))._1, id, gen), 1)
        (id, payload)
      }
      val changed = edits ++ adds
      val seg = segInDir + 1
      S.appendToIvfIndex(df(changed), dir, cb, seg = seg)
      tombs ++= edits.map { case (id, _) => (id, seg) }
      tombs ++= dels.map(id => (id, Long.MaxValue))
      edits.foreach { case (id, p) => m(id) = p }
      dels.foreach(m.remove)
      adds.foreach { case (id, p) => m(id) = p }
      segInDir = seg
      check(gen, "mor-vs-re-encode",
        Some(tombs.toSeq.toDF("vec_id", "before_seg")))
    }

    spark.stop()
    if (failures > 0) {
      System.err.println(s"[vecfuzz seed=$seed] $failures comparisons diverged")
      sys.exit(1)
    }
    println(s"[vecfuzz seed=$seed] all comparisons identical")
  }
}
