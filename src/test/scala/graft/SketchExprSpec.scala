package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SketchExpressions
import graft.pipeline.Dedup

/** The native codegen sketch expressions must match a straight Scala
  * re-derivation bit for bit, under both codegen and interpreted eval. */
class SketchExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[2]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def refMinhash(hs: Seq[Long], numHashes: Int): Seq[Long] =
    (0 until numHashes).map { i =>
      hs.foldLeft(Long.MaxValue)((m, h) =>
        math.min(m, SketchExpressions.splitmix64(h + i * 0x9E3779B97F4A7C15L)))
    }

  private def refSimhash(hs: Seq[Long]): Long = {
    val votes = Array.fill(64)(0)
    hs.foreach(h => (0 until 64).foreach(b =>
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1))
    (0 until 64).foldLeft(0L)((fp, b) => if (votes(b) > 0) fp | (1L << b) else fp)
  }

  test("MinhashSig and SimhashFp match the Scala re-derivation (incl. empty input)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(20)(i => (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextLong()))) :+
      (99L, Seq.empty[Long])
    val df = rows.toDF("id", "hs")
    val got = df.select(col("id"),
        SketchExpressions.minhashSig(col("hs"), 16).as("sig"),
        SketchExpressions.simhashFp(col("hs")).as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    rows.foreach { case (id, hs) =>
      val (sig, fp) = got(id)
      assert(sig == refMinhash(hs, 16), s"minhash mismatch for id $id")
      assert(fp == refSimhash(hs), s"simhash mismatch for id $id")
    }
  }

  private def refOph(hs: Seq[Long], bins: Int): Seq[Long] = {
    val shift = 64 - Integer.numberOfTrailingZeros(bins)
    val out = Array.fill(bins)(Long.MaxValue)
    hs.foreach { h =>
      val z = SketchExpressions.splitmix64(h)
      val b = (z >>> shift).toInt
      if (z < out(b)) out(b) = z
    }
    for (i <- 0 until bins if out(i) == Long.MaxValue) {
      var d = 1
      while (d < bins && out((i + d) & (bins - 1)) == Long.MaxValue) d += 1
      if (d < bins) out(i) = out((i + d) & (bins - 1)) + d * 0xC2B2AE3D27D4EB4FL
    }
    out.toSeq
  }

  test("OphSig matches the Scala re-derivation (sparse input forces densification; empty input all-sentinel)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    // 3 hashes into 16 bins → most bins empty → densification path exercised
    val rows = Seq.tabulate(20)(i => (i.toLong, Seq.fill(rnd.nextInt(6))(rnd.nextLong()))) :+
      (99L, Seq.empty[Long])
    val df = rows.toDF("id", "hs")
    val got = df.select(col("id"), SketchExpressions.ophSig(col("hs"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, hs) =>
      assert(got(id) == refOph(hs, 16), s"oph mismatch for id $id")
    }
    assert(got(99L).forall(_ == Long.MaxValue), "empty input must stay all-sentinel")
  }

  test("sketch pipeline stages carry no Scala UDF (native codegen end to end)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = Dedup.wordsOf(col("text"))
    val plan = docs.select(Dedup.minhashSignature(col("text")).as("sig"),
        Dedup.simhash(col("text")).as("fp"),
        SketchExpressions.ophSig(
          transform(Dedup.shinglesOf(words, 3), s => xxhash64(s)), 64).as("oph"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"UDF survived in: ${plan.take(500)}")
    assert(plan.contains("minhash_sig") && plan.contains("simhash_fp") && plan.contains("oph_sig"))
  }
}
