package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Assembly

/**
 * Invariant gates for the corpus-assembly operators (p23–p27). The DuckDB
 * oracle pins exact values at sf0.01; these pin the structural contracts —
 * packing contiguity, chunk coverage, sampling determinism/unbiasedness,
 * mixing-weight algebra — on the sf0.001 corpus.
 */
class AssemblySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("packPlan: offsets are a gapless prefix sum and bucketWidth never changes the result") {
    val plan = Assembly.packPlan(docs, blockTokens = 128, bucketWidth = 32L)
      .orderBy("doc_id").collect()
    // contiguity: each doc starts exactly where the previous one ended
    plan.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("tok_start") ==
        a.getAs[Long]("tok_start") + a.getAs[Long]("n_tokens"))
      case _ => ()
    }
    assert(plan.head.getAs[Long]("tok_start") == 0L)
    // block span matches the offsets
    plan.foreach { r =>
      val (s, n) = (r.getAs[Long]("tok_start"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("block_first") == s / 128)
      assert(r.getAs[Long]("block_last") == (if (n == 0) s / 128 else (s + n - 1) / 128))
    }
    // the two-phase prefix sum is bucketWidth-invariant (and equals the
    // naive single-partition global window)
    val other = Assembly.packPlan(docs, blockTokens = 128, bucketWidth = 7L)
      .orderBy("doc_id").collect()
    assert(plan.map(_.toSeq.toList).toList == other.map(_.toSeq.toList).toList)
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long").as("n"))
      .withColumn("tok_start", coalesce(sum("n").over(w), lit(0L)))
      .orderBy("doc_id").select("doc_id", "tok_start").collect()
    assert(plan.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"))).toSeq ==
      naive.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("chunkPlan: windows cover every token, respect the stride, and never overrun") {
    val window = 40
    val stride = 30
    val chunks = Assembly.chunkPlan(docs, window, stride)
      .orderBy("doc_id", "chunk_idx").collect()
      .groupBy(_.getAs[Long]("doc_id")).toSeq
    val nTok = docs.select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.map(_._1).toSet == nTok.keySet) // every doc chunked
    chunks.foreach { case (id, cs) =>
      val n = nTok(id)
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") == i.toLong)
        assert(c.getAs[Long]("tok_start") == i.toLong * stride)
        assert(c.getAs[Long]("tok_end") == math.min(i.toLong * stride + window, n))
      }
      // full coverage: last chunk reaches n, and consecutive chunks overlap
      assert(cs.last.getAs[Long]("tok_end") == n)
      cs.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("tok_start") < a.getAs[Long]("tok_end"))
        case _ => ()
      }
    }
  }

  test("sampleStratified: deterministic, rate-faithful per stratum, weight = 1/rate") {
    val rates = Map("en" -> 0.8, "de" -> 0.4, "fr" -> 0.4, "es" -> 0.4, "zh" -> 0.2)
    val a = Assembly.sampleStratified(docs, rates).orderBy("doc_id").collect()
    val b = Assembly.sampleStratified(docs, rates).orderBy("doc_id").collect()
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList) // no RNG state
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong).toMap
    rates.foreach { case (lang, rate) =>
      val n = perLang.getOrElse(lang, 0L)
      if (n >= 20) { // binomial tolerance: 4 sigma
        val tol = 4.0 * math.sqrt(n * rate * (1 - rate))
        assert(math.abs(kept.getOrElse(lang, 0L) - n * rate) <= tol,
          s"$lang kept ${kept.getOrElse(lang, 0L)} of $n at rate $rate")
      }
    }
    a.foreach(r => assert(math.abs(
      r.getAs[Double]("weight") * r.getAs[Double]("rate") - 1.0) < 1e-12))
  }

  test("mixWeights: shares sum to 1 and reweighted shares are uniform") {
    val m = Assembly.mixWeights(docs).collect()
    val shareSum = m.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val target = 1.0 / m.length
    m.foreach { r =>
      assert(math.abs(r.getAs[Double]("weight") * r.getAs[Double]("share") - target) < 1e-9)
    }
  }

  test("packPlan/chunkPlan invariants hold on random corpora (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 5 + rnd.nextInt(40)
      // sparse doc_ids (gaps!) and wildly varying lengths incl. empty text
      val rows = (0 until n).map { i =>
        val id = i.toLong * (1 + rnd.nextInt(5)) + rnd.nextInt(3)
        (id, Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(9)).mkString(" "))
      }.distinctBy(_._1)
      val docs = rows.toDF("doc_id", "text")
      val block = 8 + rnd.nextInt(50)
      val bw = 1L + rnd.nextInt(9)
      val plan = Assembly.packPlan(docs, block, bw).orderBy("doc_id").collect()
      assert(plan.head.getAs[Long]("tok_start") == 0L)
      plan.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("tok_start") ==
          a.getAs[Long]("tok_start") + a.getAs[Long]("n_tokens"))
        case _ => ()
      }
      val window = 4 + rnd.nextInt(20)
      val stride = 1 + rnd.nextInt(window)
      val chunks = Assembly.chunkPlan(docs, window, stride)
        .orderBy("doc_id", "chunk_idx").collect()
        .groupBy(_.getAs[Long]("doc_id"))
      chunks.foreach { case (_, cs) =>
        val nTok = math.max(cs.last.getAs[Long]("tok_end"), 0L)
        cs.foreach { c =>
          assert(c.getAs[Long]("tok_end") - c.getAs[Long]("tok_start") <= window)
          assert(c.getAs[Long]("tok_start") == c.getAs[Long]("chunk_idx") * stride)
        }
        if (nTok > 0) assert(cs.last.getAs[Long]("tok_end") == nTok)
      }
    }
  }

  test("packPlan adaptive bucketWidth: driver fold bounded at MaxPackBuckets for any corpus size") {
    // the bucket count the driver collects is <= maxId/width + 1
    Seq(0L, 100L, 1000000L, 1000000000L, Long.MaxValue / 2).foreach { maxId =>
      val w = Assembly.adaptiveBucketWidthForTest(maxId)
      assert(w >= 128L)
      assert(maxId / w + 1 <= Assembly.MaxPackBuckets, s"maxId $maxId width $w")
    }
    // the adaptive default produces the identical plan (bucketWidth-invariant)
    val adaptive = Assembly.packPlan(docs, blockTokens = 128).orderBy("doc_id").collect()
    val explicit = Assembly.packPlan(docs, blockTokens = 128, bucketWidth = 32L)
      .orderBy("doc_id").collect()
    assert(adaptive.map(_.toSeq.toList).toList == explicit.map(_.toSeq.toList).toList)
  }

  test("sampleStratified then trainValTestSplit: split hash is decorrelated from the sample hash") {
    // r4 advice: with the identical hash, every sampled doc (u < rate <=
    // trainFrac) landed in 'train' and val/test were empty
    val rates = Map("en" -> 0.5, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.5, "zh" -> 0.5)
    val split = Assembly.trainValTestSplit(
        docs.join(Assembly.sampleStratified(docs, rates).select("doc_id"), "doc_id", "left_semi"),
        0.8, 0.1)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = split.values.sum
    assert(n > 100, s"fixture too small: $n")
    assert(split.keySet == Set("train", "val", "test"),
      s"sampled corpus must hit all three splits, got $split")
    assert(math.abs(split("train").toDouble / n - 0.8) < 0.1, split.toString)
  }

  test("trainValTestSplit: fractions roughly honored; assignments stable under corpus growth") {
    val d = docs
    val full = Assembly.trainValTestSplit(d, 0.8, 0.1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = full.size
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.1, counts.toString)
    assert(counts.keySet == Set("train", "val", "test"))
    // the half-corpus assigns identically — growth never reshuffles splits
    val half = Assembly.trainValTestSplit(d.where(col("doc_id") < 250), 0.8, 0.1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    half.foreach { case (id, s) => assert(full(id) == s, s"doc $id reshuffled") }
  }

  test("lengthBuckets: bucket is exactly floor(log2(tokens)); counts cover the corpus") {
    val b = Assembly.lengthBuckets(docs, batchDocs = 32).collect()
    val totalDocs = b.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == docs.count())
    b.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val nd = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_batches") == math.ceil(nd.toDouble / 32).toLong)
      if (bucket >= 0) {
        // every doc in the bucket has tokens in [2^bucket, 2^(bucket+1))
        val lo = 1L << bucket
        val avg = r.getAs[Long]("n_tokens").toDouble / nd
        assert(avg >= lo && avg < 2L * lo, s"bucket $bucket avg $avg out of [$lo, ${2 * lo})")
      }
    }
  }

  test("degenerate corpora: empty and single-doc inputs don't break any operator") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "lang", "source", "text")
    assert(Assembly.packPlan(empty.select("doc_id", "text")).count() == 0)
    assert(Assembly.chunkPlan(empty.select("doc_id", "text")).count() == 0)
    assert(Assembly.sampleStratified(empty, Map("en" -> 0.5)).count() == 0)
    assert(Assembly.mixWeights(empty).count() == 0)
    assert(Assembly.unigramLmScore(empty).count() == 0)
    val one = Seq((7L, "en", "src0", "just one tiny document here"))
      .toDF("doc_id", "lang", "source", "text")
    val p = Assembly.packPlan(one.select("doc_id", "text")).collect()
    assert(p.length == 1 && p.head.getAs[Long]("tok_start") == 0L)
    val m = Assembly.mixWeights(one).collect()
    assert(m.length == 1 && math.abs(m.head.getAs[Double]("weight") - 1.0) < 1e-12)
    // r6e operators on the same degenerate inputs
    assert(Assembly.shardPlan(empty.select("doc_id", "text"), 4).count() == 0)
    assert(Assembly.bigramLmScore(empty).count() == 0)
    assert(graft.pipeline.TextStats.wordEntropy(empty).count() == 0)
    assert(graft.pipeline.Curation.sourceOverlap(empty, 3).count() == 0)
    assert(graft.pipeline.Curation.bpePairs(empty).count() == 0)
    val sh = Assembly.shardPlan(one.select("doc_id", "text"), 4).collect()
    assert(sh.length == 1 && sh.head.getAs[Long]("shard_seq") == 1L &&
      sh.head.getAs[Long]("tok_offset") == 0L)
    assert(graft.pipeline.Curation.sourceOverlap(one, 3).count() == 0,
      "one source has no pairs")
    val we = graft.pipeline.TextStats.wordEntropy(one).head()
    assert(we.getAs[Double]("ttr") == 1.0, "all-distinct words → ttr 1")
  }

  test("unigramLmScore: common-word text outscores rare-token soup; scores are negative") {
    val s = spark
    import s.implicits._
    val fixture = Seq(
      (1L, "the cat sat on the mat and the dog sat on the rug"),
      (2L, "the cat sat on the mat and the dog sat on the rug"),
      (3L, "zqx vwpk jrtl mnbv qwerty zxcvb plmokn ijnuhb ygvtfc rdxesz")
    ).toDF("doc_id", "text")
    val scores = Assembly.unigramLmScore(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logp")).toMap
    assert(scores.values.forall(_ < 0.0)) // log-probs
    assert(scores(1L) == scores(2L))      // identical docs score identically
    assert(scores(1L) > scores(3L))       // fluent beats gibberish
    // n_words matches the tokenizer
    val n = Assembly.unigramLmScore(fixture).where(col("doc_id") === 1L)
      .select("n_words").head().getLong(0)
    assert(n == 13L)
  }

  test("perplexityBuckets: CCNet terciles are balanced and ordered head < middle < tail") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = Assembly.perplexityBuckets(docs).cache()
    val total = b.count()
    val sizes = b.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("head", "middle", "tail"), sizes.toString)
    // terciles: each bucket within a few docs of total/3 (ties at the cut)
    sizes.values.foreach(s =>
      assert(math.abs(s - total / 3.0) <= math.max(4, total / 10.0), sizes.toString))
    // the split is monotone in perplexity: max(head) <= min(middle) <= ...
    val stats = b.groupBy("bucket")
      .agg(min("ppl").as("mn"), max("ppl").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(stats("head")._2 <= stats("middle")._1)
    assert(stats("middle")._2 <= stats("tail")._1)
    b.unpersist()
  }

  test("dsirSelect: the target domain's own documents are over-represented in the selection") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 50
    val sel = Assembly.dsirSelect(docs, docs.where(col("source") === "src1"), k).cache()
    assert(sel.count() == k)
    // selection lift: src1's share of the selected set must beat its share
    // of the corpus (the whole point of importance ranking)
    val selSrc1 = sel.join(docs.select("doc_id", "source"), "doc_id")
      .where(col("source") === "src1").count()
    val corpusShare = docs.where(col("source") === "src1").count().toDouble / docs.count()
    assert(selSrc1.toDouble / k > corpusShare,
      s"src1 selected $selSrc1/$k vs corpus share $corpusShare")
    sel.unpersist()
  }

  test("bigramLmScore: closed-form add-one bigram probabilities on a planted corpus") {
    val sp = spark
    import sp.implicits._
    // bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,b) → cb(a,b)=3, cb(b,a)=1,
    // cu(a)=3, cu(b)=1, V=3 (a, b and doc3's z)
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = Assembly.bigramLmScore(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp")))).toMap
    assert(!out.contains(3L), "a one-word doc has no bigrams")
    val pAB = math.log(4.0 / 6); val pBA = math.log(2.0 / 4)
    // tolerance 1e-5: per-bigram terms quantize to 1e6-scaled longs
    // before the mean (order-independent integer sum — the p67 class)
    assert(out(1L)._1 == 3 && math.abs(out(1L)._2 - (2 * pAB + pBA) / 3) < 1e-5)
    assert(out(2L)._1 == 1 && math.abs(out(2L)._2 - pAB) < 1e-5)
  }

  test("shardPlan: LCG positions replay exactly, shards partition the corpus, offsets prefix-sum") {
    val plan = Assembly.shardPlan(docs, nShards = 4).cache()
    assert(plan.count() == docs.count())
    // exact LCG replay on a sampled row
    val r = plan.orderBy("doc_id").head()
    val id = r.getAs[Long]("doc_id")
    assert(r.getAs[Long]("pos") == (1103515245L * id + 12345L) % (1L << 31))
    assert(r.getAs[Long]("shard") == r.getAs[Long]("pos") % 4)
    // within every shard: seq is 1..n dense and tok_offset is the exact
    // prefix sum of n_tokens in (pos, doc_id) order
    plan.orderBy("shard", "pos", "doc_id").collect()
      .groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
        var expectSeq = 1L; var expectOff = 0L
        rows.foreach { row =>
          assert(row.getAs[Long]("shard_seq") == expectSeq)
          assert(row.getAs[Long]("tok_offset") == expectOff)
          expectSeq += 1; expectOff += row.getAs[Long]("n_tokens")
        }
      }
    plan.unpersist()
  }

  test("curriculumPlan: every shard writes head before middle before tail; within a stage the LCG order holds") {
    val plan = Assembly.curriculumPlan(docs, nShards = 4).cache()
    assert(plan.count() == docs.count())
    // stage is a pure function of bucket
    assert(plan.where(
      (col("bucket") === "head" && col("stage") =!= 0L) ||
      (col("bucket") === "middle" && col("stage") =!= 1L) ||
      (col("bucket") === "tail" && col("stage") =!= 2L)).count() == 0)
    // within every shard, shard_seq order is non-decreasing in stage and
    // (stage, pos, doc_id)-sorted; offsets prefix-sum exactly
    plan.orderBy("shard", "shard_seq").collect()
      .groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
        var expectOff = 0L
        var prev: (Long, Long, Long) = (-1L, -1L, -1L)
        rows.zipWithIndex.foreach { case (row, i) =>
          assert(row.getAs[Long]("shard_seq") == i + 1L)
          assert(row.getAs[Long]("tok_offset") == expectOff)
          expectOff += row.getAs[Long]("n_tokens")
          val key = (row.getAs[Long]("stage"), row.getAs[Long]("pos"), row.getAs[Long]("doc_id"))
          assert(Ordering[(Long, Long, Long)].lt(prev, key),
            s"write order must be (stage, pos, doc_id)-sorted: $prev !< $key")
          prev = key
        }
      }
    // both terciles actually appear (the fixture is not degenerate)
    assert(plan.select("stage").distinct().count() >= 2)
    plan.unpersist()
  }
}
