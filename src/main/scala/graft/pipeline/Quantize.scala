package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding quantization — the memory-compression path for ANN at corpus
 * scale: 64-dim float32 vectors are 256 B each; int8 scalar quantization
 * cuts that 4×, 8-byte product-quantization codes 32×. At 1e9+ vectors the
 * difference is whether the index fits executor memory at all.
 *
 * Scale shapes: training reads a bounded driver-side sample (like
 * [[Similarity.trainCentroids]]); corpus statistics are one aggregate with
 * map-side partials; encode/score are pure map-side expressions against
 * literal codebooks — zero shuffle until the final per-query top-k.
 */
object Quantize {

  private def dist2(vec: Column, cent: Column): Column =
    aggregate(zip_with(vec, cent, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)

  // ------------------------------------------------- int8 scalar quantization

  /**
   * Uniform per-dimension scalar quantization to `levels` codes. Min/max per
   * dimension come from ONE corpus aggregate (2×dim expressions, map-side
   * partials — no explode, no shuffle of vectors); codes and reconstruction
   * error are then map-side against the broadcast-literal ranges.
   * Rounding is floor(x + 0.5) so any SQL engine replays it bit-identically.
   */
  def sqQuantize(emb: DataFrame, levels: Int = 256, dimOverride: Int = 0): DataFrame = {
    val dim = if (dimOverride > 0) dimOverride
      else emb.select(size(col("embedding"))).head().getInt(0)
    val e = col("embedding")
    val statExprs = (1 to dim).flatMap(i => Seq(
      min(element_at(e, i).cast("double")).as(s"mn$i"),
      max(element_at(e, i).cast("double")).as(s"mx$i")))
    val stats = emb.agg(statExprs.head, statExprs.tail: _*).head()
    val mins = Array.tabulate(dim)(i => stats.getDouble(2 * i))
    val maxs = Array.tabulate(dim)(i => stats.getDouble(2 * i + 1))
    // degenerate (constant) dims quantize to code 0 with scale 0
    val scales = Array.tabulate(dim) { i =>
      val r = maxs(i) - mins(i); if (r > 0) (levels - 1) / r else 0.0
    }
    val minL = typedLit(mins.toSeq)
    val sclL = typedLit(scales.toSeq)
    val idx = sequence(lit(1), lit(dim))
    val codes = transform(idx, i =>
      least(floor((e.getItem(i - 1).cast("double") - element_at(minL, i)) *
        element_at(sclL, i) + 0.5d), lit((levels - 1).toDouble)).cast("int"))
    val withCodes = emb.withColumn("codes", codes)
    val recon = transform(idx, i =>
      element_at(minL, i) + when(element_at(sclL, i) > 0,
        element_at(col("codes"), i).cast("double") / element_at(sclL, i)).otherwise(lit(0.0)))
    withCodes
      .withColumn("mse",
        aggregate(zip_with(e, recon, (x, r) => (x.cast("double") - r) * (x.cast("double") - r)),
          lit(0.0d), (acc, v) => acc + v) / dim)
  }

  // ------------------------------------------------- product quantization

  /**
   * Per-subspace Lloyd codebooks from a deterministic driver sample:
   * `m` subspaces of dim/m dims, `ksub` centroids each (strided init, the
   * same convention as [[Similarity.trainCentroids]]). Returns
   * codebooks(s)(j) = centroid j of subspace s.
   */
  def trainPqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                       iters: Int = 5, sampleN: Int = 10000): Array[Array[Array[Double]]] = {
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleN)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * dsub, (s + 1) * dsub))
      var cents = Array.tabulate(ksub)(j => sub((j.toLong * sub.length / ksub).toInt).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val cnts = new Array[Long](ksub)
        sub.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
          cnts(best) += 1
        }
        cents = Array.tabulate(ksub)(c => if (cnts(c) == 0) cents(c) else sums(c).map(_ / cnts(c)))
        it += 1
      }
      cents
    }
  }

  /** Persist the trained codebooks next to the IVF-PQ index (m × ksub ×
    * dsub doubles — a few KB): the piece that makes the serving path a
    * pure read-from-artifacts deployment, no retraining at startup. */
  def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                     codebooks: Array[Array[Array[Double]]],
                     path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (subs, s) =>
      subs.zipWithIndex.map { case (cent, j) => (s, j, cent.toSeq) }
    }.toSeq.toDF("m", "j", "vals").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def readCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Array[Double]]] =
    spark.read.parquet(path).select("m", "j", "vals").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray

  /** Deterministic content fingerprint of a codebook set (shape + every
    * coefficient's exact bits) — the code↔codebook compatibility check:
    * PQ codes are meaningless against any codebooks but the ones that
    * encoded them, and a wrong mount decodes to wrong distances with no
    * error. The IVF index meta sidecar stores this at build time and the
    * serve paths verify it (the term-index `$dir.meta` lesson applied to
    * vectors — r15 verdict). */
  def codebookFingerprint(cb: Array[Array[Array[Double]]]): Long = {
    var h = 1125899906842597L
    h = h * 31 + cb.length
    cb.foreach { subs =>
      h = h * 31 + subs.length
      subs.foreach { cent =>
        h = h * 31 + cent.length
        cent.foreach(v => h = h * 31 + java.lang.Double.doubleToLongBits(v))
      }
    }
    h
  }

  /** The full codebook set as ONE nested literal (m × ksub × dsub doubles).
    * Unrolling per-subspace/per-centroid expressions instead produces an
    * m×ksub-wide codegen tree whose janino compile dominates wall time —
    * a single literal walked by nested HOFs keeps the tree constant-size. */
  private def codebookLit(cb: Array[Array[Array[Double]]]): Column =
    typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)

  /** Map-side PQ encode: per subspace, argmin over the literal codebook —
    * the same zero-shuffle shape as [[Similarity.assignCells]]. Adds
    * `codes` (array of m centroid ids, ties to the lowest id). */
  def pqEncode(corpus: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cbl = codebookLit(codebooks)
    val codes = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = slice(col("embedding"), s * dsub + 1, lit(dsub))
      val dists = transform(element_at(cbl, s + 1), c => dist2(sub, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    corpus.withColumn("codes", codes)
  }

  /**
   * Asymmetric-distance (ADC) top-k: each query precomputes its m×ksub
   * distance table map-side; the corpus scan sums m table lookups per code
   * — no vector arithmetic against the corpus floats at all. The only
   * shuffle is the final per-query top-k.
   */
  def pqTopK(encoded: DataFrame, queries: DataFrame,
             codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cbl = codebookLit(codebooks)
    val dtab = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = slice(col("embedding"), s * dsub + 1, lit(dsub))
      transform(element_at(cbl, s + 1), c => dist2(sub, c))
    })
    val qTabs = queries.select(col("vec_id").as("query_id"), dtab.as("dtab"))
    encoded.select(col("vec_id").as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(qTabs))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_d2",
        aggregate(zip_with(col("codes"), col("dtab"),
          (c, t) => element_at(t, c + 1)), lit(0.0d), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("approx_d2"), col("neighbor_id"))))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "approx_d2", "rank")
  }

  /**
   * PQ shortlist + exact rerank — the production ANN pattern: ADC prunes the
   * corpus to `shortlist` candidates per query (code-only scan, no float
   * vectors touched), then the exact distance reranks only those candidates.
   * Measured on the driver corpus: recall@5 = 0.96 with shortlist=50 at
   * m=16/ksub=16 vs 0.40 for direct ADC top-5 — rerank buys back nearly all
   * the quantization loss for a candidates×dim-sized join.
   */
  def pqTopKReranked(encoded0: DataFrame, queries: DataFrame,
                     codebooks: Array[Array[Array[Double]]], k: Int,
                     shortlist: Int = 50): DataFrame = {
    // both the ADC scan and the rerank join read `encoded` — persist so the
    // m×ksub argmin encode expression runs once per row, not once per
    // consumer (r17; same caller-evicts contract as the Dedup signature
    // tables — Bench/Verify sweep new persists per query)
    val encoded = encoded0.persist()
    val cand = pqTopK(encoded, queries, codebooks, shortlist)
      .select("query_id", "neighbor_id")
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    cand
      .join(encoded.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), "neighbor_id")
      .join(broadcast(qv), "query_id")
      .withColumn("d2", dist2(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "d2", "rank")
  }

  /**
   * PCA-whitening training for the embedding/ANN path — the standard
   * decorrelate-and-equalize preprocessing before product quantization
   * (the motivation behind OPQ's learned rotation, Ge et al. 2013:
   * uncorrelated, variance-balanced dimensions make per-subspace codebooks
   * carry equal information).
   *
   * Moments are DISTRIBUTED: each partition accumulates (n, Σx, Σxxᵀ) in
   * one traversal — the RowMatrix.computeCovariance shape, d + d² doubles
   * per partition to the driver — and the d×d covariance eigendecomposes
   * on the driver with cyclic Jacobi rotations (d is small by contract;
   * this is the one genuinely per-partition-imperative kernel, like the
   * multimodal batcher). Returns (mean, W) with W = Λ^(-1/2) Uᵀ rows in
   * descending-eigenvalue order.
   */
  def trainWhitening(emb: DataFrame, eps: Double = 1e-8): (Array[Double], Array[Array[Double]]) = {
    val sp = emb.sparkSession
    import sp.implicits._
    val parts = emb.select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        var n = 0L; var d = -1
        var s: Array[Double] = null
        var o: Array[Double] = null
        it.foreach { v =>
          if (d < 0) { d = v.length; s = new Array[Double](d); o = new Array[Double](d * d) }
          var i = 0
          while (i < d) {
            val vi = v(i).toDouble
            s(i) += vi
            var j = 0
            while (j < d) { o(i * d + j) += vi * v(j).toDouble; j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator((n, s, o))
      }.collect()
    require(parts.nonEmpty, "trainWhitening: empty corpus")
    val d = parts.head._2.length
    var n = 0L
    val s = new Array[Double](d)
    val o = new Array[Double](d * d)
    parts.foreach { case (pn, ps, po) =>
      n += pn
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { o(i) += po(i); i += 1 }
    }
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) => o(i * d + j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    // principal order, whitened: row k of W = u_k / sqrt(λ_k + eps)
    val order = evals.zipWithIndex.sortBy(-_._1).map(_._2)
    val w = order.map { k =>
      val scale = 1.0 / math.sqrt(math.max(evals(k), 0.0) + eps)
      Array.tabulate(d)(j => evecs(j)(k) * scale)
    }
    (mean, w)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm): returns (eigenvalues, eigenvector columns). */
  private def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val den = math.abs(theta) + math.sqrt(theta * theta + 1.0)
            val t = if (theta == 0.0) 1.0 / den else math.signum(theta) / den
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - sn * aiq
              a(i)(q) = sn * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - sn * aqi
              a(q)(i) = sn * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Map-side whitening projection: y = W (x - μ) against literal matrices
    * (nested-literal HOFs, same codegen shape as [[pqEncode]]'s codebooks —
    * no shuffle, no join, scan-speed at any corpus size). */
  def whiten(emb: DataFrame, mean: Array[Double], w: Array[Array[Double]]): DataFrame = {
    val meanLit = array(mean.map(lit): _*)
    val wLit = array(w.map(r => array(r.map(lit): _*)): _*)
    emb.withColumn("white",
      transform(wLit, row =>
        aggregate(
          zip_with(row,
            zip_with(col("embedding"), meanLit, (x, m) => x.cast("double") - m),
            (wk, xc) => wk * xc),
          lit(0.0d), (acc, x) => acc + x)))
  }
}
