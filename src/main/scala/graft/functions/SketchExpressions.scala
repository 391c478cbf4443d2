package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Native Catalyst expressions for the sketch hot loops, registered through
 * the sanctioned `SparkSessionExtensions.injectFunction` extension point
 * (wired in GraftSession.builder, also usable via `spark.sql.extensions`).
 *
 * The minhash/simhash signature folds run numHashes×shingles (resp.
 * 64×tokens) primitive-long operations per document. As Scala UDFs the
 * input arrives as a boxed `Seq[Long]` — every element allocates — and the
 * call sits outside whole-stage codegen. These expressions generate the
 * loop directly into the stage body over `ArrayData.getLong` (zero boxing,
 * zero allocation beyond the output array) with an interpreted `eval`
 * fallback: the (b)-tier extension — a scalar kernel Spark's built-ins
 * can't express efficiently — not a new operator.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(h, Literal(n: Int, IntegerType)) => MinhashSig(h, n)
        case other => throw new IllegalArgumentException(
          s"minhash_sig(array<bigint>, <int literal>), got $other")
      }))
    ext.injectFunction((FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFp].getName, "simhash_fp"),
      (args: Seq[Expression]) => SimhashFp(args.head)))
    ext.injectFunction((FunctionIdentifier("oph_sig"),
      new ExpressionInfo(classOf[OphSig].getName, "oph_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(h, Literal(n: Int, IntegerType)) => OphSig(h, n)
        case other => throw new IllegalArgumentException(
          s"oph_sig(array<bigint>, <int literal>), got $other")
      }))
    ext.injectFunction((FunctionIdentifier("srp_band_keys"),
      new ExpressionInfo(classOf[SrpBandKeys].getName, "srp_band_keys"),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(bits: Int, IntegerType), Literal(bands: Int, IntegerType),
                 Literal(dim: Int, IntegerType), Literal(seed: Int, IntegerType)) =>
          SrpBandKeys(v, bits, bands, dim, seed)
        case other => throw new IllegalArgumentException(
          s"srp_band_keys(array<float>, <4 int literals>), got $other")
      }))
    ext.injectFunction((FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName, "bloom_might_contain_long"),
      (args: Seq[Expression]) => args match {
        case Seq(h, Literal(bytes: Array[Byte], org.apache.spark.sql.types.BinaryType)) =>
          BloomMightContainLong(h, bytes)
        case other => throw new IllegalArgumentException(
          s"bloom_might_contain_long(bigint, <binary literal>), got $other")
      }))
    // aggregate functions returned bare are wrapped in AggregateExpression
    // by the analyzer, exactly like the built-in registry's entries
    ext.injectFunction((FunctionIdentifier("bounded_collect_long"),
      new ExpressionInfo(classOf[BoundedCollectLong].getName, "bounded_collect_long"),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(cap: Int, IntegerType)) => BoundedCollectLong(v, cap)
        case other => throw new IllegalArgumentException(
          s"bounded_collect_long(bigint, <int literal>), got $other")
      }))
    ext.injectFunction((FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MisraGriesTopK].getName, "mg_topk"),
      (args: Seq[Expression]) => args match {
        case Seq(w, Literal(kk: Int, IntegerType)) => MisraGriesTopK(w, kk)
        case other => throw new IllegalArgumentException(
          s"mg_topk(string, <int literal>), got $other")
      }))
  }
}

object SketchExpressions {

  /** splitmix64 finalizer over (h + i·GOLDEN) — must match the Java emitted
    * by the codegen paths below bit for bit. */
  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def minhashSig(baseHashes: Column, numHashes: Int): Column =
    call_function("minhash_sig", baseHashes, lit(numHashes))

  def ophSig(baseHashes: Column, numBins: Int): Column =
    call_function("oph_sig", baseHashes, lit(numBins))

  def simhashFp(tokenHashes: Column): Column =
    call_function("simhash_fp", tokenHashes)

  def srpBandKeys(embedding: Column, bitsPerBand: Int, nBands: Int,
                  dim: Int, seed: Int): Column =
    call_function("srp_band_keys", embedding, lit(bitsPerBand), lit(nBands),
      lit(dim), lit(seed))

  def bloomMightContainLong(hash64: Column, bloomBytes: Array[Byte]): Column =
    call_function("bloom_might_contain_long", hash64, lit(bloomBytes))

  def boundedCollectLong(v: Column, cap: Int): Column =
    call_function("bounded_collect_long", v, lit(cap))

  private[functions] def requireLongArray(e: Expression, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<bigint>, got ${other.catalogString}")
    }
}

/** signature(i) = min over base hashes h of splitmix64(h + i·GOLDEN),
  * i ∈ [0, numHashes). Input array<long>, output array<long> (never null
  * elements; an empty shingle set yields Long.MaxValue sentinels, same as
  * the UDF it replaces). */
case class MinhashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExpressions.requireLongArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = SketchExpressions.splitmix64(hs.getLong(j) + i * 0x9E3779B97F4A7C15L)
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val z = ctx.freshName("z")
      s"""
         |long[] $out = new long[$numHashes];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $z = $c.getLong($j) + (long) $i * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $m) $m = $z;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * One-permutation-hashing MinHash signature (Li/Owen/Zhang 2012) with
 * rotation densification (Shrivastava/Li 2014): ONE splitmix64 mix per
 * shingle hash routes it to a bin by its top bits and min-folds within the
 * bin — O(shingles) total versus classic minhash's O(shingles × numBins).
 * Empty bins borrow circularly from the next filled bin to the right,
 * offset by distance × C so borrowed positions only match when the donor
 * bins match at the same rotation — keeping position-match Jaccard
 * estimation unbiased for the same signature width.
 *
 * This is the 100 TB signature path: hashing cost per document drops
 * numBins-fold while banding/verification stay identical to [[MinhashSig]].
 * numBins must be a power of two (bin = top log2(numBins) bits).
 */
case class OphSig(child: Expression, numBins: Int) extends UnaryExpression {
  require(numBins >= 2 && (numBins & (numBins - 1)) == 0,
    s"oph_sig: numBins must be a power of two >= 2, got $numBins")

  private val shift = 64 - Integer.numberOfTrailingZeros(numBins)
  // distance offset for rotation-densified bins; odd constant so collisions
  // across different rotations are as unlikely as raw hash collisions
  private val ROT = 0xC2B2AE3D27D4EB4FL

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExpressions.requireLongArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "oph_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(numBins)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val z = SketchExpressions.splitmix64(hs.getLong(j))
      val b = (z >>> shift).toInt
      if (z < out(b)) out(b) = z
      j += 1
    }
    var i = 0
    while (i < numBins) {
      if (out(i) == Long.MaxValue) {
        var d = 1
        while (d < numBins && out((i + d) & (numBins - 1)) == Long.MaxValue) d += 1
        if (d < numBins) out(i) = out((i + d) & (numBins - 1)) + d * ROT
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val z = ctx.freshName("z")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      s"""
         |long[] $out = new long[$numBins];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $z = $c.getLong($j) + 0x9E3779B97F4A7C15L;
         |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |  $z = $z ^ ($z >>> 31);
         |  int $b = (int) ($z >>> $shift);
         |  if ($z < $out[$b]) $out[$b] = $z;
         |}
         |for (int $i = 0; $i < $numBins; $i++) {
         |  if ($out[$i] == Long.MAX_VALUE) {
         |    int $d = 1;
         |    while ($d < $numBins && $out[($i + $d) & ${numBins - 1}] == Long.MAX_VALUE) $d++;
         |    if ($d < $numBins) $out[$i] = $out[($i + $d) & ${numBins - 1}] + $d * ${ROT}L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Signed-random-projection band keys over a float-embedding column:
 * key(b) = the `bitsPerBand` sign bits of <v, plane_p> for the band's
 * planes, the LSH bucketing [[graft.pipeline.Similarity.srpNearDupPairs]]
 * joins on. Hyperplanes are generated ON EACH EXECUTOR from the (seed, dim)
 * parameters — a deterministic Gaussian fill identical to the former driver
 * UDF's — so only four ints travel with the plan, not nPlanes×dim doubles.
 *
 * Replaces a Scala UDF whose per-row boxed Seq[Float] sat outside
 * whole-stage codegen on the corpus-wide signature scan (the same shape the
 * r3 OPH work eliminated for minhash): this codegen loop reads
 * ArrayData.getFloat directly — zero boxing, one long[] per row.
 */
case class SrpBandKeys(child: Expression, bitsPerBand: Int, nBands: Int,
                       dim: Int, seed: Int) extends UnaryExpression {
  private val nPlanes = bitsPerBand * nBands

  @transient private lazy val planes: Array[Array[Double]] = SrpBandKeys.planesFor(nPlanes, dim, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val keys = new Array[Long](nBands)
    val lim = math.min(v.numElements(), dim)
    var p = 0
    while (p < nPlanes) {
      val pl = planes(p)
      var d = 0.0
      var i = 0
      while (i < lim) { d += v.getFloat(i) * pl(i); i += 1 }
      if (d >= 0) keys(p / bitsPerBand) |= (1L << (p % bitsPerBand))
      p += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // planes regenerate from the seed once per generated-class instance
      // (init, not per row) — the plan ships four ints, not nPlanes×dim
      // doubles
      val pl = ctx.addMutableState("double[][]", "srpPlanes",
        v => s"$v = graft.functions.SrpBandKeys.planesFor($nPlanes, $dim, $seed);")
      val keys = ctx.freshName("keys")
      val lim = ctx.freshName("lim")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      s"""
         |long[] $keys = new long[$nBands];
         |int $lim = Math.min($c.numElements(), $dim);
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double[] $row = $pl[$p];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $lim; $i++) $d += $c.getFloat($i) * $row[$i];
         |  if ($d >= 0) $keys[$p / $bitsPerBand] |= (1L << ($p % $bitsPerBand));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBandKeys {
  /** Deterministic Gaussian hyperplanes — the exact fill order of the former
    * driver-side generation, so results are bit-stable across releases. */
  def planesFor(nPlanes: Int, dim: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}

/**
 * Bloom-filter membership over a 64-bit hash column against a serialized
 * `org.apache.spark.util.sketch.BloomFilter` carried as a plan literal (the
 * same ship-with-the-plan shape as Spark's own runtime-filter
 * BloomFilterMightContain). The filter deserializes once per executor via
 * the codegen reference; the per-row check is one virtual call on a
 * primitive long — no UDF boundary, no boxing, no per-row allocation.
 */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val f = ctx.addReferenceObj("bloomFilter", filter,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      s"${ev.value} = $f.mightContainLong($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint: per-bit majority vote over the token hashes
  * (bit set when set-votes outnumber clear-votes). Input array<long>,
  * output long. */
case class SimhashFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    SketchExpressions.requireLongArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
