package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One banded signature row on the stream. */
case class BandedSig(doc_id: Long, ts: java.sql.Timestamp, band: Int,
                     bandHash: Long, sig: Seq[Long])

/** A verified near-duplicate pair (doc_a < doc_b, batch convention). */
case class StreamDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double,
                         ts: java.sql.Timestamp)

/**
 * Streaming near-duplicate detection — the incremental twin of the batch
 * [[graft.pipeline.Dedup.minhashPairsOph]]: documents arriving on a stream
 * are OPH-minhash-signed (the same native codegen expression, stateless),
 * banded, and checked against the signatures previously seen in each band
 * bucket. Emits verified pairs (position-match estimated Jaccard >=
 * threshold) as they become known.
 *
 * Scale design: state lives per (band, bandHash) bucket — the same sharding
 * as the batch band join — holding at most `maxOccupancy` signatures, and is
 * evicted `horizon` past the newest member's event time. A pair colliding in
 * several bands emits from EVERY colliding bucket and is deduplicated
 * downstream by `dropDuplicatesWithinWatermark(doc_a, doc_b)`: the earlier
 * lowest-band-emits rule needed no dedup state, but its cross-bucket
 * invariant ("the lowest colliding band still holds both docs") breaks
 * under occupancy/horizon eviction — a higher band would then defer to a
 * bucket that can no longer emit and the pair was silently lost. Dedup
 * state is one row per distinct pair within the watermark delay — bounded,
 * and the misses are gone.
 */
object NearDup {

  def nearDupPairs(docs: DataFrame, k: Int = 3, numBins: Int = 64,
                   bands: Int = 16, threshold: Double = 0.8,
                   watermark: String = "1 hour", horizon: String = "24 hours",
                   maxOccupancy: Int = 64): Dataset[StreamDupPair] = {
    require(numBins % bands == 0, s"bands $bands must divide numBins $numBins")
    val spark = docs.sparkSession
    import spark.implicits._
    // Spark's static checker rejects ANY stateful op downstream of
    // flatMapGroupsWithState ("may emit rows older than the watermark").
    // Here the emitted pair ts is the just-arrived doc's event time, so a
    // pair can only be late for the dedup if the DOC already violated the
    // ingest watermark contract — the case event-time semantics declare
    // droppable anyway. The flag is Spark's sanctioned opt-in for exactly
    // this reviewed pattern.
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val rowsPerBand = numBins / bands
    val sigs = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        graft.pipeline.Dedup.wordsOf(col("text")).as("_w"))
      .select(col("doc_id"), col("ts"),
        graft.functions.SketchExpressions.ophSig(
          transform(graft.pipeline.Dedup.shinglesOf(col("_w"), k),
            s => xxhash64(s)), numBins).as("sig"))
    sigs
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
            .cast("long"))).as(Seq("band", "bandHash")))
      .select(col("doc_id"), col("ts"), col("band"), col("bandHash"), col("sig"))
      .as[BandedSig]
      .groupByKey(r => (r.band, r.bandHash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        bucketGroup(threshold, horizon, maxOccupancy))
      // the stateful op's output has no event-time column registered —
      // re-watermark the pair ts so the dedup state is itself bounded
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_a", "doc_b")
      .as[StreamDupPair]
  }

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var m = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
    m.toDouble / a.length
  }

  private def bucketGroup(threshold: Double, horizon: String,
                          maxOccupancy: Int)(
      key: (Int, Long), rows: Iterator[BandedSig],
      state: GroupState[List[BandedSig]]): Iterator[StreamDupPair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // event-time arrival order, then doc_id — deterministic replay
    val incoming = rows.toList.sortBy(r => (r.ts.getTime, r.doc_id))
    if (incoming.isEmpty) return Iterator.empty
    var seen = state.getOption.getOrElse(Nil)
    val out = List.newBuilder[StreamDupPair]
    incoming.foreach { r =>
      seen.foreach { e =>
        if (e.doc_id != r.doc_id) {
          val est = estJaccard(e.sig, r.sig)
          if (est >= threshold)
            out += StreamDupPair(math.min(e.doc_id, r.doc_id),
              math.max(e.doc_id, r.doc_id), est, r.ts)
        }
      }
      // newest first; occupancy cap bounds bucket state like the batch
      // auto-tuned bucket occupancy (oldest drop = horizon-like decay)
      seen = (r :: seen).take(maxOccupancy)
    }
    state.update(seen)
    state.setTimeoutTimestamp(incoming.map(_.ts.getTime).max, horizon)
    out.result().iterator
  }
}
