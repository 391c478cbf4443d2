package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Quantize

/**
 * Accuracy gates for embedding quantization. The SQ path also has a DuckDB
 * oracle (p28); the PQ path is hash-free but codebook-dependent, so its gate
 * is recall against the exact L2 top-k on the same corpus plus an ADC
 * distance-fidelity bound.
 */
class QuantizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("sqQuantize: codes in range, reconstruction within half a quantization step per dim") {
    val rows = Quantize.sqQuantize(emb, levels = 256, dimOverride = 64).collect()
    // codes bounded
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.forall(c => c >= 0 && c <= 255))
      assert(codes.length == 64)
      assert(r.getAs[Double]("mse") >= 0.0)
    }
    // per-dim ranges → half-step error bound: |x - recon| <= 0.5 * step,
    // so mse <= (0.5*maxStep)^2 averaged — check against the widest dim
    val e = emb.select(col("embedding")).collect().map(_.getSeq[Float](0).map(_.toDouble))
    val dim = 64
    val steps = (0 until dim).map { i =>
      val xs = e.map(_(i)); (xs.max - xs.min) / 255.0
    }
    val maxHalfStep = steps.max / 2.0
    rows.foreach { r =>
      assert(r.getAs[Double]("mse") <= maxHalfStep * maxHalfStep + 1e-12,
        s"vec ${r.getAs[Long]("vec_id")} mse ${r.getAs[Double]("mse")} > bound ${maxHalfStep * maxHalfStep}")
    }
  }

  test("pq shortlist+rerank: recall vs exact L2 top-k; ADC distances stay faithful") {
    // measured on this corpus: shortlist=50 rerank recall@5 = 0.96, direct
    // ADC top-5 recall = 0.40 (PqTune sweep) — gates sit well below both
    val cb = Quantize.trainPqCodebooks(emb, m = 16, ksub = 16, iters = 10, sampleN = 2000)
    val enc = Quantize.pqEncode(emb, cb)
    val queries = emb.where(col("vec_id") < 10)
    val k = 5
    val reranked = Quantize.pqTopKReranked(enc, queries, cb, k = k, shortlist = 50).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap

    // exact L2 top-k on the driver (500 × 64 — trivial)
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = all.toMap
    val qs = all.filter(_._1 < 10)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }; s
    }
    var hit = 0; var tot = 0
    qs.foreach { case (qid, qv) =>
      val exact = all.filter(_._1 != qid).map { case (id, v) => (d2(qv, v), id) }
        .sortBy(identity).take(k).map(_._2).toSet
      hit += exact.intersect(reranked.getOrElse(qid, Set.empty)).size
      tot += k
    }
    val recall = hit.toDouble / tot
    info(s"PQ shortlist+rerank recall@$k = $recall")
    assert(recall >= 0.8, s"PQ reranked recall@$k $recall below gate 0.8")

    // direct ADC still has to beat chance by a wide margin (random top-5 of
    // 499 would land ~0.01 recall)
    val direct = Quantize.pqTopK(enc, queries, cb, k = k).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    var dhit = 0
    qs.foreach { case (qid, qv) =>
      val exact = all.filter(_._1 != qid).map { case (id, v) => (d2(qv, v), id) }
        .sortBy(identity).take(k).map(_._2).toSet
      dhit += exact.intersect(direct.getOrElse(qid, Set.empty)).size
    }
    info(s"direct ADC recall@$k = ${dhit.toDouble / tot}")
    assert(dhit.toDouble / tot >= 0.2)

    // ADC distance fidelity on returned pairs: the quantization residual is
    // bounded, so approx distances track true distances
    val rel = Quantize.pqTopK(enc, queries, cb, k = k).collect().map { r =>
      val t = d2(byId(r.getAs[Long]("query_id")), byId(r.getAs[Long]("neighbor_id")))
      math.abs(r.getAs[Double]("approx_d2") - t) / math.max(t, 1e-9)
    }
    val meanRel = rel.sum / rel.length
    info(s"mean ADC relative error = $meanRel")
    assert(meanRel <= 0.35, s"mean ADC relative error $meanRel above 0.35")

    // reranked d2 is the exact distance (rerank stage recomputes on floats)
    Quantize.pqTopKReranked(enc, queries, cb, k = k, shortlist = 50).collect().foreach { r =>
      val t = d2(byId(r.getAs[Long]("query_id")), byId(r.getAs[Long]("neighbor_id")))
      assert(math.abs(r.getAs[Double]("d2") - t) < 1e-6)
    }
  }

  test("p44: PCA whitening — whitened covariance is the identity (the defining property)") {
    val (mean, w) = Quantize.trainWhitening(emb)
    val d = mean.length
    assert(w.length == d && w.forall(_.length == d))
    val whitened = Quantize.whiten(emb, mean, w)
      .select(org.apache.spark.sql.functions.col("white"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = whitened.length
    // empirical covariance of the whitened vectors
    val wm = Array.tabulate(d)(i => whitened.map(_(i)).sum / n)
    var maxOff = 0.0; var maxDiagErr = 0.0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        var c = 0.0
        whitened.foreach(v => c += (v(i) - wm(i)) * (v(j) - wm(j)))
        c /= n
        if (i == j) maxDiagErr = math.max(maxDiagErr, math.abs(c - 1.0))
        else maxOff = math.max(maxOff, math.abs(c))
        j += 1
      }
      i += 1
    }
    // diagonal sits at λ/(λ+ε) per dimension — the ε=1e-8 regularizer
    // leaves ~ε/λ_min relative drift, so the bound is 1e-5, not exact 1
    assert(maxDiagErr < 1e-5, s"diagonal drift $maxDiagErr")
    assert(maxOff < 1e-5, s"off-diagonal correlation $maxOff survived whitening")
    // whitened mean is ~0 (projection subtracts the training mean)
    assert(wm.forall(math.abs(_) < 1e-9))
  }
}
