package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)`).
 *
 * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
 * against the (huge) corpus, dot products via codegen'd `aggregate`/`zip_with`
 * HOFs, ranked with a per-query window → TakeOrdered. Corpus side only ever
 * streams; no corpus×corpus shuffle.
 *
 * Scale path: IVF — k-means-style coarse quantization to `nlist` centroids
 * (trained on a sample), probe `nprobe` nearest cells per query so each query
 * only scans ~nprobe/nlist of the corpus. Cell assignment is a broadcast join
 * against the centroid table.
 */
object Similarity {

  /**
   * Upper bound on the query-frame size [[ivfPqTopK]] will collect to the
   * driver (probe scores + ADC tables are driver math). 10k queries ×
   * 8 subspaces × 256 codes ≈ 160 MB of doubles — comfortably inside a
   * driver heap; anything bigger must batch.
   */
  val maxDriverQueries: Int = 10000

  /** Codegen'd dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Hybrid lexical + semantic retrieval by reciprocal-rank fusion
   * (Cormack et al. 2009, the standard BM25 × dense fusion): the BM25
   * top-`pool` and the cosine top-`pool` for one query fuse by
   * rrf = Σ 1/(kRrf + rank), a doc missing from one list contributing 0.
   * The fused score is emitted 1e6-scaled integer (1/(k+r) sums in a
   * FIXED two-term expression order — deterministic IEEE on any engine);
   * BOTH rank keys are quantized (BM25's 4dp score; the cosine rounds to
   * a 1e6-scaled integer BEFORE the rank window, pool selection included —
   * a raw-double key could rank-flip across engines on a last-ulp
   * difference between the fold here and an oracle's own cosine), doc_id
   * breaking every tie, so the fusion is total.
   *
   * Scale shape: both arms are their own measured operators (pruned
   * postings + TakeOrdered; broadcast query × one corpus scan); the
   * fusion itself is a full-outer join + arithmetic over two ≤pool-row
   * frames — the rank windows run on LIMIT-bounded frames
   * (bounded-by-contract, like the score histograms).
   */
  def hybridRrfTopK(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    terms: Seq[String], emb: DataFrame, queryVecId: Long,
                    k: Int = 10, pool: Int = 20, kRrf: Int = 60): DataFrame = {
    val bm = TextStats.bm25TopK(spark, indexDir, terms, k = pool)
      .select(col("doc_id"), col("score"))
    val wb = Window.orderBy(desc("score"), col("doc_id")) // ≤pool rows by limit
    val bmR = bm.withColumn("bm_rank", row_number().over(wb).cast("long"))
      .select(col("doc_id"), col("bm_rank"))
    // the cosine arm inline (not [[bruteForceTopK]]): the rank key must be
    // the QUANTIZED cosine so pool membership and order are engine-stable
    val qv = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    val wc = Window.orderBy(desc("cos_q"), col("doc_id")) // ≤pool rows by limit
    val cosR = emb.crossJoin(broadcast(qv))
      .where(col("vec_id") =!= queryVecId)
      .select(col("vec_id").as("doc_id"),
        round(dot(col("qv"), col("embedding")) /
          (col("qn") * norm(col("embedding"))) * 1e6).cast("long").as("cos_q"))
      .orderBy(desc("cos_q"), col("doc_id")).limit(pool)
      .withColumn("cos_rank", row_number().over(wc).cast("long"))
      .select(col("doc_id"), col("cos_rank"))
    bmR.join(cosR, Seq("doc_id"), "full_outer")
      .withColumn("rrf_x1e6", round((
        coalesce(lit(1.0) / (col("bm_rank") + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / (col("cos_rank") + kRrf), lit(0.0))) * 1e6).cast("long"))
      .select(col("doc_id"),
        coalesce(col("bm_rank"), lit(0L)).as("bm_rank"),
        coalesce(col("cos_rank"), lit(0L)).as("cos_rank"),
        col("rrf_x1e6"))
      .orderBy(desc("rrf_x1e6"), col("doc_id"))
      .limit(k)
  }

  /**
   * The SERVING composition over persisted artifacts only — what a
   * deployed retrieval endpoint runs per request: the BM25 arm from the
   * term index + sidecars ([[TextStats.bm25TopK]], pruned postings), the
   * vector arm from the IVF-PQ index + codebooks ([[ivfPqTopK]], probe →
   * ADC shortlist → exact rerank), fused by the [[hybridRrfTopK]] RRF
   * expression (1e6-scaled integer, total order). Nothing trains or scans
   * a corpus at request time; both arms read partition-pruned slices of
   * their indexes, so request cost tracks the query, not the corpus.
   */
  def hybridServeTopK(spark: org.apache.spark.sql.SparkSession,
                      termIndexDir: String, terms: Seq[String],
                      ivfPath: String, codebooksPath: String,
                      queryVec: Array[Float], k: Int = 10, pool: Int = 20,
                      nprobe: Int = 4, kRrf: Int = 60,
                      termTombstones: Option[DataFrame] = None,
                      ivfTombstones: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val bm = TextStats.bm25TopK(spark, termIndexDir, terms, k = pool,
        tombstones = termTombstones)
      .select(col("doc_id"), col("score"))
    val wb = Window.orderBy(desc("score"), col("doc_id")) // ≤pool rows by limit
    val bmR = bm.withColumn("bm_rank", row_number().over(wb).cast("long"))
      .select(col("doc_id"), col("bm_rank"))
    val (index, cents) = readIndex(spark, ivfPath)
    val cb = Quantize.readCodebooks(spark, codebooksPath)
    requireCodebookMatch(spark, ivfPath, cb)
    val annR = ivfPqTopK(index,
        Seq((-1L, queryVec.toSeq)).toDF("vec_id", "embedding"),
        cb, cents, k = pool, nprobe = nprobe, tombstones = ivfTombstones)
      .select(col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("ann_rank"))
    bmR.join(annR, Seq("doc_id"), "full_outer")
      .withColumn("rrf_x1e6", round((
        coalesce(lit(1.0) / (col("bm_rank") + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / (col("ann_rank") + kRrf), lit(0.0))) * 1e6).cast("long"))
      .select(col("doc_id"),
        coalesce(col("bm_rank"), lit(0L)).as("bm_rank"),
        coalesce(col("ann_rank"), lit(0L)).as("ann_rank"),
        col("rrf_x1e6"))
      .orderBy(desc("rrf_x1e6"), col("doc_id"))
      .limit(k)
  }

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest corpus
   * vectors (excluding itself). Queries are broadcast; ranking is a window
   * per query id (k small → rank+filter ≈ top-k heap under AQE).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // per-ROW norms: corpus norms would otherwise be recomputed once per query
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val scored = Par.spread(corpus).select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        norm(col("embedding")).as("cn"))
      .crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Broadcast bound for [[embedDecontam]]'s heldout side — ~1M × 64-d
    * doubles ≈ 512 MB, the edge of a sane executor broadcast. A real
    * benchmark is thousands of rows; a heldout slice that scales with
    * the corpus must go through the cell-blocked scale path instead. */
  val maxBroadcastVectors: Int = 1 << 20

  /**
   * Benchmark decontamination in embedding space — the semantic twin of
   * the gram-overlap split-leakage audit (Assembly.splitLeakage): before
   * training, every candidate document's embedding is scored against the
   * benchmark/eval set and dropped when it is a semantic near-copy of an
   * eval item (paraphrased contamination that exact n-grams cannot see).
   * Heldout membership here is the deterministic `vec_id % heldoutMod == 0`
   * slice; output is each remaining vector's EXACT max cosine against the
   * whole heldout set plus the `contaminated` flag at `tau`.
   *
   * Scale shape: the heldout side is a benchmark — small by nature — so it
   * broadcasts; the corpus streams through one codegen'd dot-product scan
   * and the groupBy(vec_id) max is a map-side partial (max is
   * order-independent, so the result is also hash-deterministic, unlike a
   * float sum). The corpus never self-joins and never shuffles its
   * embeddings — only one max row per vector moves.
   */
  def embedDecontam(emb: DataFrame, tau: Double, heldoutMod: Long = 20L): DataFrame = {
    require(heldoutMod >= 2, s"embedDecontam: heldoutMod must be >= 2, got $heldoutMod")
    // guard the broadcast BEFORE it happens (the p52/p34 require-gated
    // contract): one column-pruned count of the heldout slice
    val nHeld = emb.where(col("vec_id") % heldoutMod === 0)
      .select(col("vec_id")).count()
    require(nHeld <= maxBroadcastVectors,
      s"embedDecontam: heldout slice has $nHeld vectors (> $maxBroadcastVectors broadcast bound) — " +
        "a serving benchmark is small by contract; for corpus-scale sides use " +
        "the cell-blocked path (semanticDedup/IVF) instead of exact max-cosine")
    // widen to double BEFORE the multiplies: float32 products can flip a
    // 4dp round boundary vs an oracle computing in double (p69's DuckDB
    // twin casts the same way, so every product/sum/sqrt is bit-identical)
    val dv = transform(col("embedding"), _.cast("double"))
    val held = emb.where(col("vec_id") % heldoutMod === 0)
      .select(dv.as("hv")).select(col("hv"), norm(col("hv")).as("hn"))
    val train = emb.where(col("vec_id") % heldoutMod =!= 0)
      .select(col("vec_id"), dv.as("tv"))
      .select(col("vec_id"), col("tv"), norm(col("tv")).as("tn"))
    train.crossJoin(broadcast(held))
      .withColumn("cos", dot(col("tv"), col("hv")) / (col("tn") * col("hn")))
      .groupBy("vec_id")
      .agg((round(max(col("cos")) * 1e4) / 1e4).as("max_cosine"),
        count(lit(1)).as("n_heldout"))
      .withColumn("contaminated", (col("max_cosine") >= tau).cast("long"))
  }

  /**
   * Bounded serving model for [[embedDecontam]] — the deployed-filter
   * shape (same philosophy as Assembly.nbModelTopK): collect the
   * benchmark/heldout vectors once (driver-bounded by contract — a
   * benchmark is thousands of rows, and `maxModelVectors` enforces it),
   * pre-normalized, for map-side scoring anywhere including a stream.
   */
  def decontamModel(emb: DataFrame, heldoutMod: Long = 20L,
                    maxModelVectors: Int = 100000): (Array[Array[Double]], Array[Double]) = {
    val rows = emb.where(col("vec_id") % heldoutMod === 0)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .limit(maxModelVectors + 1).collect()
    require(rows.length <= maxModelVectors,
      s"decontamModel: heldout slice exceeds $maxModelVectors vectors — " +
        "a serving benchmark must be bounded; raise the cap deliberately")
    val vs = rows.map(_.getSeq[Double](0).toArray)
    // RAW vectors + separate norms (not pre-normalized): dividing per
    // element would break bit-parity with the batch dot/(tn·hn)
    (vs, vs.map(v => math.sqrt(v.map(x => x * x).sum)))
  }

  /**
   * Map-side decontamination scoring against a [[decontamModel]] literal:
   * max cosine of each row's embedding vs the broadcast-literal benchmark,
   * plus the `contaminated` flag — NO join, NO shuffle, NO state, so it
   * drops into a streaming pipeline unchanged (see
   * `streaming/DocPipeline.decontamStream`). BIT-identical to
   * [[embedDecontam]] on the same heldout slice: same double dot in the
   * same element order, same tn·hn product, divide last, max, 4dp round.
   */
  def decontamScore(vecs: DataFrame,
                    model: (Array[Array[Double]], Array[Double]),
                    tau: Double): DataFrame = {
    val (hvs, hns) = model
    require(hvs.nonEmpty, "decontamScore: empty benchmark model")
    val vecsLit = typedLit(hvs.map(_.toSeq).toSeq)
    val normsLit = typedLit(hns.toSeq)
    vecs
      .withColumn("_tv", transform(col("embedding"), _.cast("double")))
      .withColumn("_tn", norm(col("_tv")))
      .withColumn("max_cosine",
        round(aggregate(sequence(lit(1), lit(hvs.length)), lit(Double.MinValue),
          (acc, i) => greatest(acc,
            dot(col("_tv"), element_at(vecsLit, i.cast("int"))) /
              (col("_tn") * element_at(normsLit, i.cast("int"))))) * 1e4) / 1e4)
      .withColumn("contaminated", (col("max_cosine") >= tau).cast("long"))
      .drop("_tv", "_tn")
  }

  /**
   * Embedding-cosine near-duplicate pairs, blocked on a partition key (here
   * `label`; in production a coarse-quantizer cell id): the self-join runs
   * per block, so candidate count scales with Σ block² rather than corpus².
   *
   * SCALE CONTRACT (r18, explicit): this is the EXACT small-block variant —
   * per-block work is quadratic in block size by construction, so the
   * caller owns the block-size bound (a production coarse quantizer tunes
   * cell size exactly like an IVF nlist; a label column with a few huge
   * blocks makes this operator quadratic, full stop). For unbounded or
   * unknown block shapes the scale path is [[srpNearDupPairs]] (p14),
   * whose banding keeps candidates ∝ true duplicate density. AQE skew-join
   * splits oversized block PARTITIONS but cannot cap a single block's pair
   * count.
   */
  def labelBlockedNearDup(emb: DataFrame, threshold: Double): DataFrame = {
    // norms precomputed per ROW: inlining cosine() in the join recomputes
    // each vector's norm once per candidate pair (block-size× the work)
    val normed = Par.spread(emb).select(col("label"), col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val a = normed.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = normed.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label"), col("cosine"))
  }

  /**
   * Lloyd's k-means on a driver-collected sample (centroid count and sample
   * are small; the expensive part — assignment over the full corpus — stays
   * distributed as a broadcast join).
   */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5, sampleN: Int = 10000): Array[(Int, Array[Double])] = {
    // ordered take → TakeOrderedAndProject (no full sort) and the SAME
    // sample on every run/cluster — a bare limit() picks whichever
    // partitions answer first, making centroids nondeterministic
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleN)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    // deterministic init: evenly strided sample points
    var cents = Array.tabulate(nlist)(i => sample((i.toLong * sample.length / nlist).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val cnts = new Array[Long](nlist)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < nlist) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(nlist)(c =>
        if (cnts(c) == 0) cents(c)
        else sums(c).map(_ / cnts(c)))
      it += 1
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** Literal array of centroid vectors (tiny — nlist × dim doubles), baked
    * into the plan so distance scoring needs no join at all. */
  private def centroidArray(centroids: Array[(Int, Array[Double])]): Column =
    array(centroids.map { case (_, v) => typedLit(v.toSeq) }: _*)

  /** Squared L2 distance between a vector column and one centroid column. */
  private def dist2(vec: Column, cent: Column): Column =
    aggregate(zip_with(vec, cent, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)

  /** Assign every corpus vector to its nearest centroid — pure map-side
    * argmin over a literal centroid array: zero shuffle, zero row expansion.
    * (The r2 version crossJoined corpus×centroids and ranked with a window —
    * an nlist× expansion plus a full shuffle of the corpus; at 100 TB that
    * shuffle dominates the IVF build.) Ties break to the lowest cell index
    * because array_position returns the first match. */
  def assignCells(corpus: DataFrame, centroids: Array[(Int, Array[Double])]): DataFrame = {
    val cellIds = array(centroids.map { case (i, _) => lit(i) }: _*)
    val dists = transform(centroidArray(centroids), c => dist2(col("embedding"), c))
    corpus.withColumn("cell",
      element_at(cellIds, array_position(dists, array_min(dists)).cast("int")))
  }

  /**
   * IVF top-k: probe the `nprobe` nearest cells per query; only vectors in
   * probed cells are scored. Query→cell fanout is a broadcast; the corpus
   * side is partition-pruned by the cell equality join.
   */
  def ivfTopK(corpusWithCells: DataFrame, queries: DataFrame,
              centroids: Array[(Int, Array[Double])], k: Int, nprobe: Int): DataFrame = {
    // Map-side probe selection: score all centroids per query row via a
    // literal array, array_sort by (dist2, cell) — struct sort is
    // lexicographic by field order — and explode the first nprobe. No
    // query×centroid expansion, no window shuffle.
    val scoredCells = array(centroids.map { case (i, v) =>
      struct(dist2(col("embedding"), typedLit(v.toSeq)).as("d"), lit(i).as("cell"))
    }: _*)
    val qCells = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(slice(array_sort(scoredCells), 1, nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))
    val scored = corpusWithCells
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        norm(col("embedding")).as("cn"), col("cell"))
      .join(broadcast(qCells.withColumn("qn", norm(col("qv")))), "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /**
   * Signed-random-projection LSH near-duplicate pairs — the scale path for
   * [[labelBlockedNearDup]], whose per-block self-join is quadratic in block
   * size (measured 13-21× cost at a 10× corpus in ScaleBench). SRP collision
   * probability per bit is 1 − θ/π, so high-cosine pairs collide in at least
   * one band with near-certainty while the bucket join prunes everything
   * else; candidates are then verified with the exact cosine, making
   * precision exact and recall the only approximation.
   *
   * Parameters auto-tune like IVF's nlist: band width grows with log(corpus)
   * so bucket occupancy stays near `targetBucket` (bounded candidates), and
   * the band count is solved from `minRecall` at the given threshold.
   * Occupancy defaults to 2: candidate work is ~bands × n × occupancy / 2,
   * and every extra band the recall equation demands multiplies it — an
   * occupancy of 50 measured 216 s at 50k vectors (38M candidate pairs)
   * where occupancy 2 keeps the same corpus in the hundreds of thousands.
   * The honest limit: at near-dup thresholds (≥ ~0.85) the solved band
   * count stays under the 64-band cap and the recall target is met at any
   * corpus size with candidate work ≈ 64 × occupancy per doc; at moderate
   * thresholds the needed band count exceeds the cap and recall degrades —
   * there the exact blocked join is the only correct plan, which is why
   * both operators exist. Hyperplanes are deterministic (fixed seed).
   */
  def srpNearDupPairs(emb: DataFrame, threshold: Double,
                      targetBucket: Int = 2, minRecall: Double = 0.95,
                      bitsOverride: Int = 0, bandsOverride: Int = 0,
                      nOverride: Long = 0L, dimOverride: Int = 0): DataFrame = {
    // corpus size and dimension only tune band parameters — callers that
    // know them (catalog metadata, a prior count) pass overrides and the
    // two per-call driver jobs below disappear from the plan
    val n = if (nOverride > 0) nOverride
      else math.max(emb.count(), 1L) // one metadata-scale job, like IVF training
    val bitsPerBand =
      if (bitsOverride > 0) bitsOverride
      else math.min(48, math.max(4,
        math.ceil(math.log(n.toDouble / targetBucket) / math.log(2)).toInt))
    val pBit = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
    val pBand = math.pow(pBit, bitsPerBand)
    val nBands =
      if (bandsOverride > 0) bandsOverride
      else math.min(64, math.max(1,
        math.ceil(math.log(1.0 - minRecall) / math.log(1.0 - pBand)).toInt))
    val dim = if (dimOverride > 0) dimOverride
      else emb.select(size(col("embedding"))).head.getInt(0)
    // one band key per bitsPerBand sign bits (sign of <v, plane_p>), emitted
    // by the native codegen fold [[graft.functions.SrpBandKeys]] — the
    // former Scala UDF boxed every embedding into a Seq[Float] outside
    // whole-stage codegen on the corpus-wide scan; hyperplanes regenerate
    // deterministically from the seed on each executor
    val bandKeys = graft.functions.SketchExpressions.srpBandKeys(
      col("embedding"), bitsPerBand, nBands, dim, seed = 42)
    // signatures computed once, reused by both join sides
    val sigs = Par.spread(emb).select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"), bandKeys.as("keys"))
      .persist()
    // band join on NARROW rows (ids + key only): a pair can collide in up to
    // nBands bands, so carrying the vectors here would shuffle each one
    // nBands× — dedup first, then re-attach embeddings once per surviving
    // pair for the exact-cosine verification
    val banded = sigs.select(col("vec_id"), posexplode(col("keys")).as(Seq("band", "key")))
    val candIds = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    candIds
      .join(sigs.select(col("vec_id").as("vec_a"), col("label"),
        col("embedding").as("ea"), col("nrm").as("na")), "vec_a")
      .join(sigs.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), "vec_b")
      .withColumn("cosine", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label"), col("cosine"))
  }

  // --------------------------------------------------- IVF index persistence

  /**
   * Persist a built IVF index: the cell-assigned corpus lands as Parquet
   * PARTITIONED BY cell, the centroids as a small sidecar table. The cell
   * partitioning is the point at serving scale — [[ivfTopK]]'s probe join
   * filters on cell equality, so a query touching nprobe of nlist cells
   * reads only those directories (partition pruning), not the corpus.
   *
   * Rows carry a `seg` column (0 for the base build) so the index rides
   * the same merge-on-read segment contract as the term index:
   * [[appendToIvfIndex]] adds higher segments, `(vec_id, before_seg)`
   * tombstones kill earlier rows, [[compactIvfIndex]] /
   * [[retrainIvfIndex]] are the janitors.
   */
  def writeIndex(corpusWithCells: DataFrame, centroids: Array[(Int, Array[Double])],
                 path: String): Unit = {
    val spark = corpusWithCells.sparkSession
    import spark.implicits._
    corpusWithCells.withColumn("seg", lit(0L)).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/corpus")
    centroids.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  // ------------------------------------------- IVF index MoR maintenance
  //
  // The vector twin of TextStats.appendToTermIndex/compactTermIndex: a
  // corpus refresh must cost work proportional to the CHANGED vectors,
  // never a retrain + re-encode + rewrite of the whole index. The
  // published practice this follows: an IVF index adds new vectors by
  // assigning them against the EXISTING coarse quantizer and codebooks
  // (Faiss's IndexIVF add-after-train contract; Jégou et al. 2011 §IV —
  // the quantizer is trained once, additions only quantize), deletions
  // are tombstones merged at query time, and centroid drift is repaired
  // by a periodic offline re-train + re-encode pass over the alive rows
  // (the FreshDiskANN split: a fast in-place delta path plus a periodic
  // consolidation rebuild, Singh et al. 2021, arXiv:2105.09613).

  /** Alive index rows under `(vec_id, before_seg)` tombstones — the same
    * broadcast anti-join contract as the term index (tombstones are
    * refresh-sized by nature: only CHANGED vectors have one). */
  private def aliveVecs(rows: DataFrame, tombstones: Option[DataFrame]): DataFrame =
    tombstones.fold(rows) { tb =>
      val t = tb.select(col("vec_id").as("_tid"), col("before_seg"))
      rows.join(broadcast(t),
        col("vec_id") === col("_tid") && col("seg") < col("before_seg"),
        "left_anti")
    }

  /**
   * Delta-sized segment append: the new/edited vectors assign to the
   * index's EXISTING centroids (read from the sidecar) and encode with
   * the EXISTING codebooks — no training, no rewrite; the appended files
   * land inside the same cell=N partition dirs, so probe-time partition
   * pruning is unchanged. The caller records tombstones for edited /
   * deleted ids exactly as with [[graft.pipeline.TextStats.appendToTermIndex]].
   */
  def appendToIvfIndex(newVecs: DataFrame, path: String,
                       codebooks: Array[Array[Array[Double]]],
                       seg: Long): Unit = {
    require(seg > 0L, "appendToIvfIndex: appended segments start at 1")
    val spark = newVecs.sparkSession
    val (_, cents) = readIndex(spark, path)
    Quantize.pqEncode(assignCells(newVecs, cents), codebooks)
      .withColumn("seg", lit(seg))
      .write.mode("append").partitionBy("cell").parquet(s"$path/corpus")
  }

  /** The cheap janitor: rewrite the ALIVE rows as a fresh seg-0 index at
    * `outDir`, centroids and codebooks unchanged — a drop-in after which
    * the tombstone table is empty. One index scan + the broadcast
    * tombstone anti-join + the write's own cell partitioning. Use
    * [[retrainIvfIndex]] instead when the appended mass has drifted the
    * cell balance (the consolidation half of the FreshDiskANN split).
    *
    * The output is SELF-CONTAINED (r15 verdict): the codebooks sidecar
    * and the meta fingerprint travel with the compacted index, so a
    * caller can mount `outDir` with zero extra configuration — a stale
    * `codebooksPath` pointing at the old dir stays correct only by
    * accident here, but after a retrain it would decode codes against
    * the wrong codebooks (wrong distances, no error), exactly the silent
    * class the fingerprint check kills. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      tombstones: DataFrame, outDir: String): Unit = {
    require(outDir != path,
      "compactIvfIndex: outDir must be a fresh location (the scan reads path)")
    aliveVecs(spark.read.parquet(s"$path/corpus"), Some(tombstones))
      .withColumn("seg", lit(0L))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$outDir/corpus")
    val cents = spark.read.parquet(s"$path/centroids")
    cents.coalesce(1).write.mode("overwrite").parquet(s"$outDir/centroids")
    if (dirExists(spark, s"$path/codebooks")) {
      val cb = Quantize.readCodebooks(spark, s"$path/codebooks")
      Quantize.writeCodebooks(spark, cb, s"$outDir/codebooks")
      writeIndexMeta(spark, outDir, cb)
    }
  }

  /**
   * The retrain janitor — the documented policy for centroid drift: when
   * appended segments have shifted the data distribution (cells overfull,
   * recall sagging), re-train the coarse quantizer AND the PQ codebooks on
   * the alive corpus, re-assign, re-encode, and write a fresh seg-0 index.
   * The new codebooks persist INSIDE `outDir` (`$outDir/codebooks` + the
   * meta fingerprint), so the retrained index is a self-contained mount —
   * and a mount that still points at the OLD codebooks fails loudly on
   * the fingerprint instead of decoding wrong distances silently. Also
   * returned for callers composing further encodes. This is the ONLY
   * full-rebuild-cost path in the lifecycle, and it runs offline —
   * queries keep serving the old index + deltas until the swap.
   */
  def retrainIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      tombstones: DataFrame, outDir: String,
                      nlist: Int, m: Int = 8, ksub: Int = 16,
                      iters: Int = 5, sampleN: Int = 10000): Array[Array[Array[Double]]] = {
    require(outDir != path,
      "retrainIvfIndex: outDir must be a fresh location (the scan reads path)")
    val alive = aliveVecs(spark.read.parquet(s"$path/corpus"), Some(tombstones))
      .select(col("vec_id"), col("embedding"))
    val cents = trainCentroids(alive, nlist, iters, sampleN)
    val cb = Quantize.trainPqCodebooks(alive, m, ksub, iters, sampleN)
    writeIndex(Quantize.pqEncode(assignCells(alive, cents), cb), cents, outDir)
    Quantize.writeCodebooks(spark, cb, s"$outDir/codebooks")
    writeIndexMeta(spark, outDir, cb)
    cb
  }

  private def dirExists(spark: org.apache.spark.sql.SparkSession,
                        p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Alive-corpus weighted mean squared distance to assigned centroids —
    * the scalar drift profile [[ivfMaintenanceAdvice]] compares against
    * the build-time baseline in the meta sidecar. */
  def overallMeanD2(spark: org.apache.spark.sql.SparkSession, path: String,
                    tombstones: Option[DataFrame] = None): Double = {
    val r = ivfCellStats(spark, path, tombstones)
      .agg(sum(col("n_alive")).as("n"),
        sum(col("n_alive") * col("mean_d2")).as("w")).head()
    if (r.isNullAt(0) || r.getLong(0) == 0L) 0.0
    else r.getDouble(1) / r.getLong(0)
  }

  /** The index meta sidecar (`$path/meta`): the codebook fingerprint the
    * corpus codes were encoded with (the code↔codebook compatibility
    * check — [[Quantize.codebookFingerprint]]) and the build-time
    * `base_mean_d2` drift baseline. Written at build / compact / retrain;
    * serve paths verify the fingerprint when the sidecar exists (legacy
    * dirs without one keep working). */
  def writeIndexMeta(spark: org.apache.spark.sql.SparkSession, path: String,
                     codebooks: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    Seq((Quantize.codebookFingerprint(codebooks), overallMeanD2(spark, path)))
      .toDF("codebook_fp", "base_mean_d2")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (codebook_fp, base_mean_d2) from the meta sidecar, None for a legacy
    * dir without one. */
  def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
                    path: String): Option[(Long, Double)] =
    if (!dirExists(spark, s"$path/meta")) None
    else {
      val r = spark.read.parquet(s"$path/meta")
        .select("codebook_fp", "base_mean_d2").head()
      Some((r.getLong(0), r.getDouble(1)))
    }

  /** Fail-loudly guard on the code↔codebook pairing: when the index has
    * a meta sidecar, the mounted codebooks MUST fingerprint-match the
    * codes (after a retrain, the old codebooks silently decode to wrong
    * distances — the exact class `$dir.meta` kills on the term side). */
  def requireCodebookMatch(spark: org.apache.spark.sql.SparkSession,
                           ivfPath: String,
                           codebooks: Array[Array[Array[Double]]]): Unit =
    readIndexMeta(spark, ivfPath).foreach { case (fp, _) =>
      require(Quantize.codebookFingerprint(codebooks) == fp,
        s"codebooks do not match the codes in $ivfPath (fingerprint " +
          s"mismatch) — after a retrain, mount $ivfPath/codebooks; " +
          "decoding against foreign codebooks returns wrong distances " +
          "with no error")
    }

  /** The automated consolidation policy over [[ivfCellStats]] — the
    * decision half of the FreshDiskANN delta/consolidate split
    * (arXiv:2105.09613 §4: a fast in-place delta path plus a periodic
    * consolidation chosen by measured state, not taste):
    *
    *   - `retrain` when the appended mass no longer fits the trained
    *     quantizer — alive mean_d2 has risen past `d2RatioMax` × the
    *     build-time baseline (quantizer drift: recall sags because
    *     probes miss the true cells), or appended rows exceed
    *     `appendedFracMax` of the alive corpus (enough new mass that the
    *     trained centroids no longer represent the distribution).
    *   - `compact` when dead rows (tombstoned edits/deletes) exceed
    *     `deadFracMax` of the stored rows — serve cost scans them and
    *     the anti-join grows, but the quantizer is still right.
    *   - `none` otherwise: keep appending deltas.
    *
    * Cost: one [[ivfCellStats]] pass (column-pruned scan, map-side dist2,
    * nlist-row agg) + a metadata row count. The baseline comes from the
    * meta sidecar; a legacy dir without one reads ratio 1.0 (drift
    * undetectable — documented, not guessed). */
  def ivfMaintenanceAdvice(spark: org.apache.spark.sql.SparkSession,
                           path: String, tombstones: Option[DataFrame] = None,
                           appendedFracMax: Double = 0.25,
                           deadFracMax: Double = 0.25,
                           d2RatioMax: Double = 1.5): IvfAdvice = {
    val r = ivfCellStats(spark, path, tombstones)
      .agg(sum(col("n_alive")).as("n"), sum(col("n_appended")).as("a"),
        sum(col("n_alive") * col("mean_d2")).as("w")).head()
    val nAlive = if (r.isNullAt(0)) 0L else r.getLong(0)
    val nApp = if (r.isNullAt(1)) 0L else r.getLong(1)
    val meanD2 = if (nAlive > 0) r.getDouble(2) / nAlive else 0.0
    val total = spark.read.parquet(s"$path/corpus").count()
    val deadFrac = if (total > 0) 1.0 - nAlive.toDouble / total else 0.0
    val appFrac = if (nAlive > 0) nApp.toDouble / nAlive else 0.0
    val d2Ratio = readIndexMeta(spark, path).map(_._2).filter(_ > 0)
      .map(meanD2 / _).getOrElse(1.0)
    val action =
      if (d2Ratio > d2RatioMax || appFrac > appendedFracMax) "retrain"
      else if (deadFrac > deadFracMax) "compact"
      else "none"
    IvfAdvice(action, appFrac, deadFrac, d2Ratio)
  }

  /** [[ivfMaintenanceAdvice]]'s verdict: `action` ∈ none/compact/retrain
    * plus the measured fractions that chose it. */
  case class IvfAdvice(action: String, appendedFraction: Double,
                       deadFraction: Double, d2Ratio: Double)

  /**
   * Per-cell occupancy and drift diagnostics over a (possibly maintained)
   * IVF index — the MEASURABLE retrain trigger behind [[retrainIvfIndex]]'s
   * documented policy: one row per cell with `n_alive`, `n_appended`
   * (alive rows in delta segments) and `mean_d2` (mean squared L2 of
   * alive vectors to their assigned centroid, 4dp). Appended mass that no
   * longer fits the trained quantizer shows up as rising `mean_d2` and/or
   * appended rows concentrating in few cells; when either passes taste
   * (e.g. appended fraction or mean_d2 ratio vs the base build), schedule
   * the offline consolidation pass — the FreshDiskANN delta/consolidate
   * split (arXiv:2105.09613).
   *
   * Scale shape: ONE column-pruned index scan, a map-side dist2 against
   * the literal centroid array, an nlist-row aggregate with map-side
   * partials — no joins, no vector shuffle; output is cell-cardinality-
   * sized whatever the corpus.
   */
  def ivfCellStats(spark: org.apache.spark.sql.SparkSession, path: String,
                   tombstones: Option[DataFrame] = None): DataFrame = {
    val (corpusDf, cents) = readIndex(spark, path)
    require(cents.zipWithIndex.forall { case ((id, _), i) => id == i },
      "ivfCellStats: centroid ids must be consecutive 0..nlist-1")
    val alive = aliveVecs(corpusDf, tombstones)
    alive
      .withColumn("_d2",
        dist2(col("embedding"), element_at(centroidArray(cents), col("cell") + 1)))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_alive"),
        sum((col("seg") > 0).cast("long")).as("n_appended"),
        (round(avg(col("_d2")) * 1e4) / 1e4).as("mean_d2"))
      .orderBy("cell")
  }

  /** Load a persisted IVF index: (cell-partitioned corpus, centroids). */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): (DataFrame, Array[(Int, Array[Double])]) = {
    val corpus = spark.read.parquet(s"$path/corpus")
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (corpus, cents)
  }

  /**
   * End-to-end ANN serving over a PERSISTED index — the composition a
   * 100 TB retrieval deployment actually runs: IVF probe selection →
   * ADC (code-only) shortlist over the probed cells → exact rerank of the
   * shortlist. The index is [[writeIndex]] output whose corpus also carries
   * [[Quantize.pqEncode]] codes.
   *
   * Scale shape: probe selection and the per-query ADC distance tables are
   * computed on the DRIVER (queries are the small side by contract —
   * q × nlist and q × m × ksub doubles), which turns the probed cells into
   * LITERAL predicates: both serving scans arrive at the parquet index with
   * a PartitionFilter and read nprobe directories per query, never the
   * corpus. The shortlist stage touches only the 8-byte code column; the
   * float vectors are read once, for the candidates' cells, at rerank.
   */
  def ivfPqTopK(index: DataFrame, queries: DataFrame,
                codebooks: Array[Array[Array[Double]]],
                centroids: Array[(Int, Array[Double])],
                k: Int, nprobe: Int, shortlist: Int = 50,
                maxQ: Int = maxDriverQueries,
                tombstones: Option[DataFrame] = None): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val qs = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    require(qs.nonEmpty, "ivfPqTopK: empty query set")
    // the driver computes q × nlist probe scores and q × m × ksub ADC
    // doubles — fine while queries are the small side BY CONTRACT; enforce
    // it so a corpus-sized query frame fails fast instead of OOMing the
    // driver. Above this, batch the queries or move probe+ADC to a
    // broadcast-join path.
    require(qs.length <= maxQ,
      s"ivfPqTopK: ${qs.length} queries exceeds the driver-side contract " +
        s"($maxQ) — batch the query set or raise maxQ only with driver " +
        "memory to match")
    // nearest-nprobe cells per query (driver math over the tiny centroid set)
    val probes: Seq[(Long, Int)] = qs.toSeq.flatMap { case (qid, qv) =>
      centroids.map { case (cid, c) =>
        var d = 0.0; var i = 0
        val n = math.min(qv.length, c.length)
        while (i < n) { val t = qv(i) - c(i); d += t * t; i += 1 }
        (d, cid)
      }.sortBy(identity).take(nprobe).map { case (_, cid) => (qid, cid) }.toSeq
    }
    val allCells = probes.map(_._2).distinct
    // per-query ADC tables: dtab(s)(j) = ||q_s - codebook(s)(j)||²
    val dtabs: Map[Long, Seq[Seq[Double]]] = qs.map { case (qid, qv) =>
      qid -> Seq.tabulate(m)(s => codebooks(s).toSeq.map { cent =>
        var d = 0.0; var i = 0
        while (i < dsub) { val t = qv(s * dsub + i) - cent(i); d += t * t; i += 1 }
        d
      })
    }.toMap
    val qTab = broadcast(probes.map { case (qid, cid) => (qid, cid, dtabs(qid)) }
      .toDF("query_id", "cell", "dtab"))
    // the alive view of the probed cells: partition pruning FIRST, then
    // the broadcast tombstone anti-join on the pruned slice — on a
    // merge-on-read-maintained index an edited vector has rows in both
    // its old and new segments, and without the anti-join the SAME
    // neighbor_id would rank twice (old codes and new codes)
    val pruned = aliveVecs(index.where(col("cell").isin(allCells: _*)), tombstones)
    // stage 1 — ADC shortlist: partition-pruned CODE-ONLY scan of the
    // probed cells, m table lookups per row, per-query top-`shortlist`
    val cand = pruned.select(col("vec_id").as("neighbor_id"), col("cell"), col("codes"))
      .join(qTab, "cell")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_d2",
        aggregate(zip_with(col("codes"), col("dtab"),
          (c, t) => element_at(t, c + 1)), lit(0.0d), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("approx_d2"), col("neighbor_id"))))
      .where(col("rank") <= shortlist)
      .select("query_id", "neighbor_id")
    // stage 2 — exact rerank: the float vectors of the probed cells join the
    // broadcast shortlist (q × shortlist rows), exact L2, top-k
    val qv = broadcast(qs.toSeq.map { case (qid, v) => (qid, v.toSeq) }.toDF("query_id", "qv"))
    pruned.select(col("vec_id").as("neighbor_id"), col("cell"),
        transform(col("embedding"), x => x.cast("double")).as("nv"))
      .join(broadcast(cand), "neighbor_id")
      .join(qv, "query_id")
      .withColumn("d2",
        aggregate(zip_with(col("qv"), col("nv"), (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "d2", "rank")
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): k-means cells act as the blocking key, pairwise
   * cosine runs only within a cell, and each document is kept unless a
   * lower-id cell-mate exceeds `tau`. The keeper rule here is the
   * deterministic min-id variant (the paper keeps the point farthest from
   * the centroid; min-id gives the same dedup rate with an exact SQL twin).
   *
   * Scale shape: candidate count is Σ|cell|² — with k grown proportionally
   * to corpus size the expected cell stays constant, so the join is linear
   * in practice; the only shuffles are the cell-keyed self-join and one
   * (vec_id)-keyed agg+join for the keeper decision. Arithmetic is double
   * throughout (cast once) so the threshold comparison is reproducible
   * against the DuckDB oracle.
   *
   * Returns (vec_id, cluster, keep ∈ {0,1}, dup_of = lowest above-τ
   * cell-mate, null when kept).
   */
  def semanticDedup(emb: DataFrame, k: Int = 8, iters: Int = 2, tau: Double = 0.3): DataFrame = {
    val assigned = Curation.kmeansAssign(emb, k, iters).select(col("vec_id"), col("cluster"))
    val vecs = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // norms per row, not per pair (same reasoning as labelBlockedNearDup)
    val av = assigned.join(vecs, "vec_id").withColumn("nrm", norm(col("v")))
    val a = av.select(col("cluster"), col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = av.select(col("cluster"), col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    val dupOf = a.join(b, Seq("cluster"))
      .where(col("vec_a") < col("vec_b"))
      .where(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= tau)
      .groupBy(col("vec_b").as("vec_id")).agg(min(col("vec_a")).as("dup_of"))
    av.select(col("vec_id"), col("cluster"))
      .join(dupOf, Seq("vec_id"), "left")
      .withColumn("keep", col("dup_of").isNull.cast("long"))
      .select(col("vec_id"), col("cluster"), col("keep"), col("dup_of"))
  }

  /** Pairwise label-centroid cosine similarity matrix (embeddings quality
    * diagnostic). Centroids average per (label, dimension) via posexplode —
    * scalar partial aggregation, so a hot label never materializes all its
    * vectors in one executor row (the r1 collect_list OOM risk); the
    * reassembly collect_list is bounded by the embedding dimension. */
  def labelCentroidSimilarity(corpus: DataFrame): DataFrame = {
    val dims = corpus
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("label"), col("i")).agg(avg(col("v")).as("m"))
    val cents = dims.groupBy(col("label"))
      .agg(map_from_entries(collect_list(struct(col("i"), col("m")))).as("mm"),
        max(col("i")).as("mx"))
      .select(col("label"),
        transform(sequence(lit(0), col("mx")), i => element_at(col("mm"), i)).as("centroid"))
    cents.as("a").crossJoin(cents.as("b"))
      .where(col("a.label") <= col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        cosine(col("a.centroid"), col("b.centroid")).as("cosine"))
  }
}
