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

  private def refSrpKeys(v: Seq[Float], bits: Int, bands: Int, dim: Int, seed: Int): Seq[Long] = {
    val planes = graft.functions.SrpBandKeys.planesFor(bits * bands, dim, seed)
    val keys = Array.fill(bands)(0L)
    for (p <- 0 until bits * bands) {
      val d = (0 until math.min(v.length, dim)).foldLeft(0.0)((a, i) => a + v(i) * planes(p)(i))
      if (d >= 0) keys(p / bits) |= (1L << (p % bits))
    }
    keys.toSeq
  }

  test("SrpBandKeys matches the Scala re-derivation (incl. short and empty vectors)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(20)(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f))) :+
      (98L, Seq.fill(3)(rnd.nextFloat() - 0.5f)) :+ (99L, Seq.empty[Float])
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"), SketchExpressions.srpBandKeys(col("v"), 4, 3, 8, 42).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == refSrpKeys(v, 4, 3, 8, 42), s"srp mismatch for id $id")
    }
  }

  test("BloomMightContainLong: recall 1 over inserted hashes; plan stays UDF-free") {
    val sp = spark
    import sp.implicits._
    val members = (1L to 500L).map(i => i * 7919L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(500, 0.01)
    members.foreach(bloom.putLong)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
    // round-trip through parquet: over a LocalRelation Catalyst folds the
    // probe away at optimization time and the plan assertions see nothing
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (members ++ (1L to 500L).map(i => i * 104729L + 13L)).toDF("h")
      .write.mode("overwrite").parquet(tmp)
    val hit = spark.read.parquet(tmp)
      .where(SketchExpressions.bloomMightContainLong(col("h"), bytes))
    val kept = hit.collect().map(_.getLong(0)).toSet
    assert(members.forall(kept.contains), "bloom must have no false negatives")
    assert(kept.size < 700, s"false-positive blowup: ${kept.size}") // fpp sanity
    val plan = hit.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan.take(500))
    assert(plan.contains("bloom_might_contain_long"), plan.take(500))
  }

  test("new expressions compile under NO_FALLBACK codegen (broken doGenCode cannot hide)") {
    val sp = spark
    import sp.implicits._
    val saved = (sp.conf.getOption("spark.sql.codegen.fallback"),
      sp.conf.getOption("spark.sql.codegen.factoryMode"))
    try {
      sp.conf.set("spark.sql.codegen.fallback", "false")
      sp.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val tmp = java.nio.file.Files.createTempDirectory("graft-codegen").toString
      val rnd = new scala.util.Random(17)
      Seq.tabulate(50)(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
        .toDF("id", "v").write.mode("overwrite").parquet(tmp)
      val df = sp.read.parquet(tmp)
      val srp = df.select(col("id"), SketchExpressions.srpBandKeys(col("v"), 4, 3, 8, 42).as("k"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(srp.size == 50 && srp.values.forall(_.length == 3))
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (1L to 100L).foreach(i => bloom.putLong(i * 31L))
      val bytes = { val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
      // ids 1..49 are members (49 guaranteed hits); id 0 maps to 0 which was
      // never inserted — a 1% fpp may or may not admit it
      val hits = df.where(SketchExpressions.bloomMightContainLong(col("id") * 31L, bytes)).count()
      assert(hits >= 49L && hits <= 50L, s"hits $hits")
    } finally {
      saved._1.fold(sp.conf.unset("spark.sql.codegen.fallback"))(v => sp.conf.set("spark.sql.codegen.fallback", v))
      saved._2.fold(sp.conf.unset("spark.sql.codegen.factoryMode"))(v => sp.conf.set("spark.sql.codegen.factoryMode", v))
    }
  }

  test("MisraGriesTopK: the MG guarantees hold under forced multi-partition partial merges") {
    val sp = spark
    import sp.implicits._
    // adversarial mix: 3 true heavy hitters spread across partitions,
    // drowned in 500 distinct singletons + a mid-band of 20 words × 8
    val rows = (
      Seq.fill(300)("hh1") ++ Seq.fill(200)("hh2") ++ Seq.fill(120)("hh3") ++
      (1 to 20).flatMap(i => Seq.fill(8)(s"mid$i")) ++
      (1 to 500).map(i => s"rare$i")
    )
    val n = rows.size.toLong
    val k = 24
    // repartition(8) forces per-partition MG buffers through
    // serialize/deserialize and the subtract-merge path (buffer cap 23
    // < the ~70 distinct values per partition)
    val df = scala.util.Random.shuffle(rows).toDF("word").repartition(8)
    val est = df.agg(call_function("mg_topk", col("word"), lit(k)).as("c"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= k - 1, s"buffer bound violated: ${est.size}")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every item with true freq > N/k must be present
    exact.filter(_._2 > n / k).keys.foreach(w =>
      assert(est.contains(w), s"true heavy hitter $w missing from $est"))
    // est(x) <= true(x) <= est(x) + N/k for everything reported
    est.foreach { case (w, e) =>
      val t = exact(w)
      assert(e <= t && t <= e + n / k, s"$w: est $e vs true $t (N/k = ${n / k})")
    }
    // and the two-phase recount equals the plain groupBy exactly
    val docs = Seq((1L, rows.mkString(" "))).toDF("doc_id", "text")
    val out = graft.pipeline.Curation.heavyHitters(docs, minFrac = 0.05, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = exact.filter(_._2 >= math.ceil(n * 0.05).toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    assert(out == want, s"recount must equal the full groupBy: $out vs $want")
  }

  test("MisraGriesTopK property: bounds hold over randomized zipf-ish streams, k, and partitioning") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 6).foreach { trial =>
      val k = 8 + rnd.nextInt(40)
      val parts = 1 + rnd.nextInt(7)
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val universe = 30 + rnd.nextInt(200)
      val weights = (0 until universe).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val rows = (1 to (500 + rnd.nextInt(2000))).map { _ =>
        val u = rnd.nextDouble() * total
        s"w${cum.indexWhere(_ >= u)}"
      }
      val n = rows.size.toLong
      val est = rows.toDF("word").repartition(parts)
        .agg(call_function("mg_topk", col("word"), lit(k)).as("c"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(est.size <= k - 1, s"trial $trial: size ${est.size} > ${k - 1}")
      exact.filter(_._2 > n / k).keys.foreach(w =>
        assert(est.contains(w), s"trial $trial (k=$k, parts=$parts): lost HH $w"))
      est.foreach { case (w, e) =>
        val t = exact(w)
        assert(e <= t && t <= e + n / k,
          s"trial $trial: $w est $e true $t bound ${n / k}")
      }
    }
  }

  test("BoundedCollectLong: cap/cap+1 boundary, overflow marker, sortedness, null skip — across partitionings") {
    val s = spark
    import s.implicits._
    val cap = 5
    // groups: exactly cap (kept, sorted), cap+1 and far beyond (overflow
    // marker: EXACTLY cap+1 values, contents partitioning-dependent —
    // callers MUST size-filter), 1 and 2 (kept), plus null inputs (skipped)
    val rows =
      (1 to cap).map(i => ("atCap", Some(i * 7L - 3))) ++
      (1 to cap + 1).map(i => ("overByOne", Some(i.toLong))) ++
      (1 to 50).map(i => ("hot", Some(100L - i))) ++
      Seq(("single", Some(42L)), ("pair", Some(9L)), ("pair", Some(2L)),
        ("withNulls", Some(5L)), ("withNulls", None), ("withNulls", Some(1L)))
    for (nPart <- Seq(1, 3, 7)) {
      val df = rows.toDF("k", "v").repartition(nPart)
      val got = df.groupBy("k")
        .agg(SketchExpressions.boundedCollectLong(col("v"), cap).as("ids"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      // at-cap group survives the size filter and arrives SORTED
      assert(got("atCap") == (1 to cap).map(i => i * 7L - 3).sorted, s"nPart=$nPart")
      // overflow groups retire at exactly cap+1 buffered values — the
      // documented marker (memory stays bounded however hot the gram);
      // every retained value is from the group, but WHICH ones is
      // partitioning-dependent, so only the size contract is asserted
      assert(got("overByOne").length == cap + 1, s"nPart=$nPart")
      assert(got("hot").length == cap + 1, s"nPart=$nPart")
      assert(got("hot").forall(v => v >= 50L && v <= 99L), s"nPart=$nPart")
      assert(got("single") == Seq(42L) && got("pair") == Seq(2L, 9L), s"nPart=$nPart")
      // nulls never collect (the conditional-collect contract the r18
      // incrementalClusters probe-sublist aggregate relies on)
      assert(got("withNulls") == Seq(1L, 5L), s"nPart=$nPart")
      // the caller-side pruning rule: size-filter keeps exactly the
      // df <= cap groups
      val kept = got.filter(_._2.length <= cap).keySet
      assert(kept == Set("atCap", "single", "pair", "withNulls"), s"nPart=$nPart")
    }
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
