package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The corpus-refresh orchestrator — ONE document delta in, EVERY persisted
 * retrieval artifact consistently out.
 *
 * The three index lifecycles (term postings — [[TextStats.appendToTermIndex]],
 * hashed shingles — [[PairMaintenance.appendToShingleIndex]], IVF-PQ vectors —
 * [[Similarity.appendToIvfIndex]]) are complete individually, but a real
 * production refresh must drive ALL of them from the SAME delta or the
 * serving tier skews silently: a doc edited in the term index but not
 * re-embedded ranks with fresh BM25 and a stale vector — no error anywhere.
 * The reference's analog is the zipper's single coherent backend snapshot
 * per request (ref `zipper/broadcast/broadcast_group.go:226-297` merges one
 * consistent view); here the coherence is enforced at WRITE time: one
 * orchestrated segment number, one tombstone derivation, one manifest row.
 *
 * Artifact layout under one root (the set [[graft.api.SearchApi]] mounts):
 * {{{
 *   root/term_index            postings (+ .doclen / .meta sidecars)
 *   root/shingle_index         hashed shingles (+ .sizes / .meta)
 *   root/ivf                   corpus/ centroids/ codebooks/ meta/
 *   root/term_tombstones       (doc_id, before_seg) — cumulative
 *   root/ivf_tombstones        (vec_id, before_seg) — cumulative
 *   root/shingle_tombstones    (doc_id, before_seg) — cumulative
 *   root/pairs/v<seg>          near-dup pair set after refresh <seg>
 *   root/clusters/v<seg>       (doc_id, cluster_id) labels after <seg>
 *   root/manifest              one row per build/refresh (append-only)
 * }}}
 *
 * Scale shape: a refresh costs work proportional to the CHANGED documents —
 * three delta-sized segment appends (each lands inside the existing
 * bucket/cell partition dirs, indexes never rewrite), one delta-sized
 * tombstone append per index, and the churn-bounded incremental pair/cluster
 * refresh. Versioned pairs/clusters dirs are append-only (a crash mid-write
 * never corrupts the previous version; readers take the max version), and
 * the manifest row lands LAST, so a manifest entry implies every artifact
 * of its segment committed.
 */
object Refresh {

  /** Path schema for one orchestrated artifact root. */
  final case class CorpusArtifacts(root: String) {
    val termIndexDir: String = s"$root/term_index"
    val shingleIndexDir: String = s"$root/shingle_index"
    val ivfPath: String = s"$root/ivf"
    val termTombstonesPath: String = s"$root/term_tombstones"
    val ivfTombstonesPath: String = s"$root/ivf_tombstones"
    val shingleTombstonesPath: String = s"$root/shingle_tombstones"
    val manifestPath: String = s"$root/manifest"
    def pairsPath(v: Long): String = s"$root/pairs/v$v"
    def clustersPath(v: Long): String = s"$root/clusters/v$v"
  }

  /** What a refresh did: the segment it landed as, the artifact set, and
    * the measured IVF consolidation advice (the FreshDiskANN decision —
    * callers schedule [[consolidate]] when it says compact/retrain). */
  final case class RefreshReport(seg: Long, artifacts: CorpusArtifacts,
                                 advice: Similarity.IvfAdvice)

  /** Order-independent content fingerprint of a tombstone table — the
    * cross-artifact consistency check: term and IVF tombstones derive from
    * the SAME delta, so their fingerprints (over the shared id + before_seg
    * payload) must be EQUAL. `/status` recomputes both sides and compares;
    * a mismatch means one index saw a refresh the other didn't. */
  def tombstoneFingerprint(tombstones: DataFrame): Long = {
    val idCol = tombstones.columns.find(c => c == "doc_id" || c == "vec_id")
      .getOrElse(throw new IllegalArgumentException(
        "tombstoneFingerprint: need a doc_id or vec_id column"))
    val r = tombstones
      .select(xxhash64(col(idCol), col("before_seg")).as("h"))
      .agg(sum(col("h"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /**
   * Build the initial (segment-0) artifact set from the full corpus.
   * `documents` is (doc_id, text, ...); `embeddings` is (vec_id, embedding,
   * ...) with vec_id ≡ doc_id (the corpus id space is shared — the hybrid
   * RRF join depends on it). Tombstone tables start EMPTY (present so a
   * serving mount needs zero conditional configuration).
   */
  def buildAll(spark: SparkSession, documents: DataFrame, embeddings: DataFrame,
               root: String, buckets: Int = 64, shingleK: Int = 3,
               nlist: Int = 8, m: Int = 16, ksub: Int = 16,
               trainIters: Int = 5, sampleN: Int = 10000,
               pairThreshold: Double = 0.5): CorpusArtifacts = {
    val a = CorpusArtifacts(root)
    val docs = documents.select(col("doc_id"), col("text"))
    TextStats.writeTermIndex(docs, a.termIndexDir, buckets = buckets)
    PairMaintenance.writeShingleIndex(docs, a.shingleIndexDir, k = shingleK,
      buckets = buckets)
    val emb = embeddings.select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainCentroids(emb, nlist, trainIters, sampleN)
    val cb = Quantize.trainPqCodebooks(emb, m, ksub, trainIters, sampleN)
    Similarity.writeIndex(
      Quantize.pqEncode(Similarity.assignCells(emb, cents), cb), cents, a.ivfPath)
    Quantize.writeCodebooks(spark, cb, s"${a.ivfPath}/codebooks")
    Similarity.writeIndexMeta(spark, a.ivfPath, cb)
    // empty cumulative tombstones, correctly typed
    emptyTombstones(docs, "doc_id").write.mode("overwrite")
      .parquet(a.termTombstonesPath)
    emptyTombstones(docs, "doc_id").write.mode("overwrite")
      .parquet(a.shingleTombstonesPath)
    emptyTombstones(emb.withColumnRenamed("vec_id", "doc_id"), "vec_id")
      .write.mode("overwrite").parquet(a.ivfTombstonesPath)
    // the exact near-dup pair set + star-CC labels, version 0
    val pairs = Dedup.ngramJaccardPairs(docs, k = shingleK,
      threshold = pairThreshold)
    pairs.write.mode("overwrite").parquet(a.pairsPath(0L))
    Dedup.dedupClustersStar(docs, spark.read.parquet(a.pairsPath(0L)))
      .write.mode("overwrite").parquet(a.clustersPath(0L))
    writeManifestRow(spark, a, seg = 0L, nEdited = 0L,
      nAdded = docs.count(), nRemoved = 0L, cb = cb)
    a
  }

  private def emptyTombstones(like: DataFrame, idName: String): DataFrame =
    like.select(col("doc_id").as(idName), lit(0L).as("before_seg")).limit(0)

  /**
   * One delta in, all artifacts out. `edited` and `added` are
   * (doc_id, text, embedding) — the doc and its re-embedding move in
   * LOCKSTEP by construction, the skew the orchestrator exists to prevent;
   * `removedIds` is 1-col (doc_id).
   *
   * Effects, all derived from the same delta and the same segment number:
   *   1. term index — changed docs' postings + doclen append as segment N
   *   2. shingle index — changed docs' shingles + sizes append as segment N
   *   3. IVF index — changed vectors assign/encode against the EXISTING
   *      quantizers (read from inside the index dir) and append as segment N
   *   4. three tombstone tables — (edited → before_seg N, removed →
   *      Long.MaxValue) appended to each cumulative artifact
   *   5. pairs + clusters — [[PairMaintenance.incrementalClusters]] over the
   *      previous version's artifacts, written as version N
   *   6. manifest — one row (LAST: its presence implies 1-5 committed)
   *
   * Precondition (checked, fails loudly): the three indexes agree on their
   * max segment — a caller that refreshed one index out-of-band has already
   * broken coherence, and appending more segments would bury the skew.
   */
  def refreshCorpus(spark: SparkSession, root: String,
                    edited: DataFrame, added: DataFrame,
                    removedIds: DataFrame,
                    pairThreshold: Double = 0.5,
                    maxDocFreq: Long = 1000): RefreshReport = {
    val a = CorpusArtifacts(root)
    val termSeg = maxSeg(spark.read.parquet(s"${a.termIndexDir}.doclen"))
    val shingleSeg = maxSeg(spark.read.parquet(a.shingleIndexDir))
    val ivfSeg = maxSeg(spark.read.parquet(s"${a.ivfPath}/corpus"))
    require(termSeg == shingleSeg && shingleSeg == ivfSeg,
      s"refreshCorpus: artifact segment skew under $root — term=$termSeg " +
        s"shingle=$shingleSeg ivf=$ivfSeg; one index was refreshed " +
        "out-of-band and serving it would skew silently (fresh BM25 with " +
        "a stale vector). Rebuild or consolidate before refreshing.")
    val seg = termSeg + 1L

    // the delta, pinned once: every consumer below derives from these
    // exact frames (a lazy re-read of a mutating source between appends
    // would let the indexes diverge within one refresh)
    val ed = edited.select(col("doc_id"), col("text"), col("embedding"))
      .localCheckpoint(true)
    val ad = added.select(col("doc_id"), col("text"), col("embedding"))
      .localCheckpoint(true)
    val rm = removedIds.select(col("doc_id")).localCheckpoint(true)
    val changedDocs = ed.unionByName(ad).select("doc_id", "text")
    val changedVecs = ed.unionByName(ad)
      .select(col("doc_id").as("vec_id"), col("embedding"))

    // tombstone state BEFORE this refresh (the incremental pair refresh
    // needs both sides) — pinned before the appends below mutate the dirs
    val tombsOld = spark.read.parquet(a.shingleTombstonesPath)
      .localCheckpoint(true)

    // 1-3) the three delta-sized segment appends
    TextStats.appendToTermIndex(changedDocs, a.termIndexDir, seg = seg)
    PairMaintenance.appendToShingleIndex(changedDocs, a.shingleIndexDir,
      seg = seg)
    val cb = Quantize.readCodebooks(spark, s"${a.ivfPath}/codebooks")
    Similarity.requireCodebookMatch(spark, a.ivfPath, cb)
    Similarity.appendToIvfIndex(changedVecs, a.ivfPath, cb, seg = seg)

    // 4) tombstones — ONE derivation, appended to all three artifacts
    val deltaTombs = ed.select(col("doc_id"), lit(seg).as("before_seg"))
      .unionByName(rm.select(col("doc_id"),
        lit(Long.MaxValue).as("before_seg")))
      .localCheckpoint(true)
    deltaTombs.write.mode("append").parquet(a.termTombstonesPath)
    deltaTombs.write.mode("append").parquet(a.shingleTombstonesPath)
    deltaTombs.withColumnRenamed("doc_id", "vec_id")
      .write.mode("append").parquet(a.ivfTombstonesPath)

    // 5) incremental pairs + clusters over the PREVIOUS version's artifacts
    val prevV = latestVersion(spark, s"$root/pairs")
    val tombsNew = spark.read.parquet(a.shingleTombstonesPath)
    val (newCC, newPairs) = PairMaintenance.incrementalClusters(spark,
      a.shingleIndexDir,
      oldPairs = spark.read.parquet(a.pairsPath(prevV)),
      oldCC = spark.read.parquet(a.clustersPath(prevV)),
      changedIds = changedDocs.select("doc_id"), removedIds = rm,
      tombstonesOld = tombsOld, tombstonesNew = tombsNew,
      refreshSegFrom = seg, threshold = pairThreshold,
      maxDocFreq = maxDocFreq)
    newPairs.write.mode("overwrite").parquet(a.pairsPath(seg))
    newCC.write.mode("overwrite").parquet(a.clustersPath(seg))

    // 6) manifest row LAST — it witnesses the whole segment
    writeManifestRow(spark, a, seg, nEdited = ed.count(), nAdded = ad.count(),
      nRemoved = rm.count(), cb = cb)

    RefreshReport(seg, a,
      Similarity.ivfMaintenanceAdvice(spark, a.ivfPath,
        Some(spark.read.parquet(a.ivfTombstonesPath))))
  }

  /**
   * The consolidation janitor, orchestrated: compact (or, when the measured
   * [[Similarity.ivfMaintenanceAdvice]] says the quantizer drifted, RETRAIN)
   * every index into a FRESH artifact root with empty tombstones and the
   * latest pairs/clusters carried over as version 0. The old root keeps
   * serving until the caller swaps mounts — the offline half of the
   * FreshDiskANN split, applied to the whole artifact set.
   */
  def consolidate(spark: SparkSession, root: String, outRoot: String,
                  nlist: Int = 8, m: Int = 16, ksub: Int = 16,
                  trainIters: Int = 5, sampleN: Int = 10000): CorpusArtifacts = {
    require(outRoot != root, "consolidate: outRoot must be a fresh location")
    val a = CorpusArtifacts(root)
    val out = CorpusArtifacts(outRoot)
    val termTombs = spark.read.parquet(a.termTombstonesPath)
    val shingleTombs = spark.read.parquet(a.shingleTombstonesPath)
    val ivfTombs = spark.read.parquet(a.ivfTombstonesPath)
    TextStats.compactTermIndex(spark, a.termIndexDir, termTombs,
      out.termIndexDir)
    PairMaintenance.compactShingleIndex(spark, a.shingleIndexDir,
      shingleTombs, out.shingleIndexDir)
    val advice = Similarity.ivfMaintenanceAdvice(spark, a.ivfPath,
      Some(ivfTombs))
    val cb =
      if (advice.action == "retrain")
        Similarity.retrainIvfIndex(spark, a.ivfPath, ivfTombs, out.ivfPath,
          nlist = nlist, m = m, ksub = ksub, iters = trainIters,
          sampleN = sampleN)
      else {
        Similarity.compactIvfIndex(spark, a.ivfPath, ivfTombs, out.ivfPath)
        Quantize.readCodebooks(spark, s"${out.ivfPath}/codebooks")
      }
    emptyTombstones(termTombs, "doc_id").write.mode("overwrite")
      .parquet(out.termTombstonesPath)
    emptyTombstones(shingleTombs, "doc_id").write.mode("overwrite")
      .parquet(out.shingleTombstonesPath)
    emptyTombstones(ivfTombs.withColumnRenamed("vec_id", "doc_id"), "vec_id")
      .write.mode("overwrite").parquet(out.ivfTombstonesPath)
    val prevV = latestVersion(spark, s"$root/pairs")
    spark.read.parquet(a.pairsPath(prevV))
      .write.mode("overwrite").parquet(out.pairsPath(0L))
    spark.read.parquet(a.clustersPath(prevV))
      .write.mode("overwrite").parquet(out.clustersPath(0L))
    writeManifestRow(spark, out, seg = 0L, nEdited = 0L, nAdded = 0L,
      nRemoved = 0L, cb = cb)
    out
  }

  /** Latest pairs/clusters version under `dir` (subdirs named v<seg>). */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"latestVersion: no versions under $dir")
    val vs = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong)
    require(vs.nonEmpty, s"latestVersion: no v<seg> dirs under $dir")
    vs.max
  }

  private def maxSeg(df: DataFrame): Long =
    if (!df.columns.contains("seg")) 0L
    else df.agg(max(col("seg"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

  private def writeManifestRow(spark: SparkSession, a: CorpusArtifacts,
                               seg: Long, nEdited: Long, nAdded: Long,
                               nRemoved: Long,
                               cb: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    val termFp = tombstoneFingerprint(
      spark.read.parquet(a.termTombstonesPath))
    val ivfFp = tombstoneFingerprint(spark.read.parquet(a.ivfTombstonesPath))
    Seq((seg, nEdited, nAdded, nRemoved,
        Quantize.codebookFingerprint(cb), termFp, ivfFp))
      .toDF("seg", "n_edited", "n_added", "n_removed",
        "codebook_fp", "term_tombstone_fp", "ivf_tombstone_fp")
      .coalesce(1).write.mode("append").parquet(a.manifestPath)
  }
}
