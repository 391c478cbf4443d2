package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A document arriving on the ingest stream (the streaming twin of the
  * batch `documents` table rows). */
case class DocEvent(doc_id: Long, ts: java.sql.Timestamp, text: String, content_hash: String)

/**
 * Streaming side of the training-data pipeline: the batch operators in
 * [[graft.pipeline]] are pure column expressions, so quality scoring and
 * token counting run on a stream UNCHANGED — the only genuinely stateful
 * piece is cross-batch deduplication, implemented here with
 * `flatMapGroupsWithState` (the custom-state primitive; watermark-bounded
 * state is the streaming analog of the batch hash-groupBy).
 *
 * Scale design: state is one Long per distinct content hash inside the
 * dedup horizon, sharded by the groupBy key across executors exactly like
 * the batch groupBy on content_hash; event-time timeouts evict state as the
 * watermark advances, so state size is bounded by (unique docs within the
 * horizon), never by stream length.
 */
object DocPipeline {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  /** Embedding-stream row shape (the ingest-side vector feed). */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("ts", TimestampType),
    StructField("embedding", ArrayType(FloatType))))

  /** File-based document stream (new Parquet files appear under `path`). */
  def docStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(path)

  /**
   * Quality gate — identical expressions to the batch
   * [[graft.pipeline.TextStats.qualityMetrics]], applied pre-dedup so
   * junk never enters the state store. Stateless: runs map-side on the
   * stream with zero extra shuffles.
   */
  def qualityGate(docs: DataFrame, minTokens: Int = 5,
                  maxPunctRatio: Double = 0.3): DataFrame =
    graft.pipeline.TextStats.qualityMetrics(docs)
      .where(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
      .select(docs.columns.map(col): _*)

  /** PII gate — the batch [[graft.pipeline.Curation.piiSignals]] regexes on
    * the stream, unchanged (stateless column math, like [[qualityGate]]).
    * Documents with any PII hit are dropped before dedup state. */
  def piiGate(docs: DataFrame): DataFrame =
    graft.pipeline.Curation.piiSignals(docs)
      .where(!col("has_pii"))
      .select(docs.columns.map(col): _*)

  /**
   * Cross-batch exact dedup: the FIRST document seen for each content hash
   * passes; every later copy — same micro-batch or any later one inside the
   * dedup horizon — is dropped. First = lowest (event time, doc_id), the
   * same keeper rule as the batch [[graft.pipeline.Dedup.exactDedup]].
   *
   * State: one Long (keeper doc_id) per hash, evicted `horizon` past the
   * keeper's event time once the watermark passes it.
   */
  def firstSeenDedup(docs: DataFrame, watermark: String = "1 hour",
                     horizon: String = "24 hours"): Dataset[DocEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark("ts", watermark)
      .withColumn("content_hash", md5(col("text")))
      .select("doc_id", "ts", "text", "content_hash")
      .as[DocEvent]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        dedupGroup(horizon))
  }

  /**
   * Corpus-monitoring rollup: per event-time window and predicted language,
   * document and token counts — the live dashboard over an ingest stream
   * (language mix drift, volume drops). Language ID and token counting are
   * the batch expressions unchanged (stateless); the only state is the
   * watermarked window aggregation, emitted once final (append mode).
   */
  def corpusStats(docs: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame =
    graft.pipeline.TextStats.languageId(docs.withWatermark("ts", watermark))
      .withColumn("n_tokens",
        graft.pipeline.TextStats.tokenCount(col("text")).cast("long"))
      .groupBy(window(col("ts"), windowLen), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .select(col("window.start").as("window_start"), col("lang_pred"),
        col("n_docs"), col("n_tokens"))

  /**
   * Streaming curated-corpus capstone — the batch
   * [[graft.pipeline.Curation.curatedCorpus]] composition on the ingest
   * stream: language gate, minimum-length gate, PII gate (all stateless
   * column math, identical expressions to batch), cross-batch dedup keeper
   * selection ([[firstSeenDedup]] — the streaming analog of the batch
   * cluster-min keeper), and deterministic train/val/test assignment
   * ([[graft.pipeline.Assembly.trainValTestSplit]] — a pure doc_id hash, so
   * a doc's split is identical in batch and streaming derivations by
   * construction).
   *
   * Emits (doc_id, ts, lang_pred, n_tokens, split) as documents clear the
   * gates — nothing waits for window finalization because the only stateful
   * stage (dedup) emits keepers immediately and uses the watermark solely
   * for state eviction.
   */
  def curatedStream(docs: DataFrame, lang: String = "en", minTokens: Int = 10,
                    trainFrac: Double = 0.9, valFrac: Double = 0.05,
                    watermark: String = "1 hour", horizon: String = "24 hours"): DataFrame = {
    val langGated = graft.pipeline.TextStats.languageId(docs)
      .withColumn("_n", graft.pipeline.TextStats.tokenCount(col("text")).cast("long"))
      .where(col("lang_pred") === lang && col("_n") >= minTokens)
      .select(docs.columns.map(col): _*)
    val deduped = firstSeenDedup(piiGate(langGated), watermark, horizon).toDF()
    graft.pipeline.Assembly.trainValTestSplit(
        graft.pipeline.TextStats.languageId(deduped), trainFrac, valFrac)
      .withColumn("n_tokens", graft.pipeline.TextStats.tokenCount(col("text")).cast("long"))
      .select(col("doc_id"), col("ts"), col("lang_pred"), col("n_tokens"), col("split"))
  }

  /**
   * Streaming shard assignment — the stateless half of the batch
   * [[graft.pipeline.Assembly.shardPlan]]: position and shard are pure
   * doc_id arithmetic (the same LCG via [[graft.pipeline.Assembly.shardPos]]),
   * so a streamed document lands in exactly the shard the batch plan puts
   * it in (gated stream ≡ batch in StreamingSpec). The per-shard
   * sequence/token-offset columns are write-time bookkeeping a shard
   * writer assigns as it appends — they depend on arrival order, which a
   * stream only has at the sink.
   */
  def shardAssign(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"shardAssign: nShards must be positive, got $nShards")
    docs
      .withColumn("n_tokens",
        graft.pipeline.TextStats.tokenCount(col("text")).cast("long"))
      .withColumn("pos", graft.pipeline.Assembly.shardPos(col("doc_id")))
      .withColumn("shard", pmod(col("pos"), lit(nShards.toLong)))
  }

  /**
   * Streaming NB domain scoring — a model trained offline on a static
   * corpus ([[graft.pipeline.Assembly.nbModelTopK]]: bounded top-k vocab
   * log-odds + prior) applied to the document stream as a pure map-side
   * HOF fold. Stateless like the quality/PII gates: no watermark, no
   * state store, every micro-batch row scores immediately, and the result
   * equals the batch scoring of the same rows with the same model by
   * construction (gated in StreamingSpec).
   */
  def nbScoreStream(docs: DataFrame, model: Map[String, Double], prior: Double): DataFrame =
    graft.pipeline.Assembly.nbScoreWithModel(docs, model, prior)
      .select(col("doc_id"), col("ts"), col("nb_logodds"),
        (col("nb_logodds") > 0).as("pred"))

  /**
   * Streaming benchmark decontamination at ingest — the admission gate
   * twin of the batch [[graft.pipeline.Similarity.embedDecontam]]: score
   * each arriving vector against the FIXED benchmark model (the bounded
   * [[graft.pipeline.Similarity.decontamModel]] literal, the same
   * deployed-model shape as [[nbScoreStream]]) and flag semantic
   * near-copies of eval items before they enter the corpus. Map-side
   * literal fold — no join, no state — and bit-identical to the batch
   * scoring of the same row (gated stream ≡ batch in StreamingSpec).
   */
  def decontamStream(vecs: DataFrame,
                     model: (Array[Array[Double]], Array[Double]),
                     tau: Double): DataFrame =
    graft.pipeline.Similarity.decontamScore(vecs, model, tau)
      .select(col("vec_id"), col("ts"), col("max_cosine"), col("contaminated"))

  /**
   * Streaming per-source percentile scoring — the deployment shape of
   * the batch [[graft.pipeline.Curation.sourcePercentile]]: the rank
   * table is trained OFFLINE on a static corpus
   * (`Curation.sourcePercentileRanks`) and each arriving doc scores
   * against it via a stateless STREAM-STATIC join (Structured Streaming
   * joins a stream to a static frame without state or watermark — the
   * static side broadcasts). A doc whose exact (source, 4dp quality)
   * bin was never seen in training gets `src_pct = -1.0` and keep = 0 —
   * the explicit "model is stale, retrain" signal, same contract
   * direction as the NB model's OOV → prior.
   */
  def percentileStream(docs: DataFrame, ranks: DataFrame): DataFrame =
    graft.pipeline.Curation.scoredQuality(docs)
      .join(broadcast(ranks), Seq("source", "quality"), "left")
      .withColumn("src_pct", coalesce(col("src_pct"), lit(-1.0)))
      .withColumn("keep", (col("src_pct") >= 0.75).cast("long"))
      .select("doc_id", "source", "quality", "src_pct", "keep")

  /**
   * Streaming tokenizer-fertility monitor — the ingest twin of the batch
   * [[graft.pipeline.Curation.tokenizerFertility]] report: each arriving
   * document's token/OOV/char counts against the OFFLINE-trained vocab (a
   * bounded literal array, the same deployed-model shape as
   * [[nbScoreStream]]'s map). Stateless map-side HOF math — no explode,
   * no join, no state; the per-source report is the sink's aggregation.
   * Summing the emitted integer counts per source reproduces the batch
   * p74 row EXACTLY (same integers → same 4dp ratios; gated stream ≡
   * batch in StreamingSpec).
   */
  def fertilityStream(docs: DataFrame, vocabWords: Seq[String]): DataFrame = {
    val vlit = array(vocabWords.map(lit): _*)
    docs
      .withColumn("_w", graft.pipeline.Dedup.wordsOf(col("text")))
      .select(col("doc_id"), col("ts"), col("source"),
        size(col("_w")).cast("long").as("n_tokens"),
        size(filter(col("_w"), x => !array_contains(vlit, x))).cast("long").as("n_oov"),
        aggregate(col("_w"), lit(0L), (a, x) => a + length(x)).as("n_chars"))
  }

  /**
   * Streaming within-doc repetition battery — the per-doc HOF twin of
   * the batch [[graft.pipeline.TextStats.repetitionStats]] (which runs
   * doc-keyed linear aggregations): every metric recomputed as STATELESS
   * column math over the document's own words array (O(distinct × len)
   * per doc — fine at stream-document sizes; the batch shape stays
   * linear for arbitrarily long documents). Both shapes reduce to the
   * same integer counts, so the fractions are bit-identical and a
   * streamed row equals the batch row exactly (gated stream ≡ batch in
   * StreamingSpec).
   */
  /**
   * Streaming shard-manifest maintenance — the
   * [[graft.pipeline.Assembly.shardManifest]] lineage record kept LIVE at
   * ingest: the same LCG shard key and md5-fold checksum term, maintained
   * by a stateful shard-keyed streaming aggregation (complete output
   * mode — the state and every emitted table are nShards-row-sized, so
   * "complete" costs shard cardinality, not corpus). Checksum terms are
   * pre-folded mod [[graft.pipeline.Assembly.ManifestMod]] and the
   * running sum folds once more in the projection, so after ANY prefix
   * of micro-batches the emitted manifest equals the batch manifest of
   * the documents ingested so far (sum-mod is a commutative monoid —
   * arrival order and batch boundaries cannot move a byte; gated
   * stream ≡ batch in StreamingSpec).
   */
  def manifestStream(docs: DataFrame, nShards: Int, configTag: String): DataFrame = {
    val A = graft.pipeline.Assembly
    docs
      .select(col("doc_id"),
        graft.pipeline.TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        pmod(A.shardPos(col("doc_id")), lit(nShards.toLong)).as("shard"),
        A.manifestTerm(col("doc_id"), col("text")).as("_h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        pmod(sum(col("_h")), lit(A.ManifestMod)).as("checksum"))
      .withColumn("config_fp", A.configFingerprint(configTag, nShards))
  }

  /** Streaming twin of `Assembly.splitManifest` (p81): the split lineage
    * record kept live as documents arrive. Same monoid argument as
    * [[manifestStream]] — count/sum/min/max and the mod-folded checksum
    * terms are commutative monoids, so the complete-mode table after any
    * micro-batch cut equals the batch manifest byte for byte. The batch
    * plan is pure column ops + one streaming-legal aggregation, so the
    * twin IS the batch definition (parity by construction); state and
    * every emitted table are 3 rows. */
  def splitManifestStream(docs: DataFrame, configTag: String,
                          trainFrac: Double = 0.9, valFrac: Double = 0.05,
                          seed: Long = 9377L): DataFrame =
    graft.pipeline.Assembly.splitManifest(docs, configTag, trainFrac, valFrac, seed)

  def repetitionStream(docs: DataFrame): DataFrame = {
    val x4 = (c: org.apache.spark.sql.Column) => round(c * 1e4).cast("long")
    docs
      .withColumn("_w", graft.pipeline.Dedup.wordsOf(col("text")))
      .withColumn("_bg", when(size(col("_w")) >= 2,
        transform(sequence(lit(1), size(col("_w")) - 1),
          i => concat_ws(" ", element_at(col("_w"), i), element_at(col("_w"), i + 1))))
        .otherwise(array_repeat(lit(""), 0)))
      .withColumn("n_words", size(col("_w")).cast("long"))
      .withColumn("dup_word_frac_x1e4",
        when(col("n_words") > 0,
          x4((size(col("_w")) - size(array_distinct(col("_w")))).cast("double") /
            size(col("_w"))))
          .otherwise(lit(0L)))
      .withColumn("dup_bigram_frac_x1e4",
        when(size(col("_bg")) > 0,
          x4((size(col("_bg")) - size(array_distinct(col("_bg")))).cast("double") /
            size(col("_bg"))))
          .otherwise(lit(0L)))
      .withColumn("_wchars", aggregate(col("_w"), lit(0L), (a, x) => a + length(x)))
      .withColumn("_topbg", aggregate(array_distinct(col("_bg")), lit(0L),
        (a, x) => greatest(a,
          size(filter(col("_bg"), y => y === x)).cast("long") * (length(x) - 1))))
      .withColumn("top_bigram_char_frac_x1e4",
        when(col("_wchars") > 0, x4(col("_topbg").cast("double") / col("_wchars")))
          .otherwise(lit(0L)))
      .withColumn("keep",
        (col("dup_bigram_frac_x1e4") <= 5000L &&
          col("top_bigram_char_frac_x1e4") <= 2000L).cast("long"))
      .select("doc_id", "ts", "n_words", "dup_word_frac_x1e4", "dup_bigram_frac_x1e4",
        "top_bigram_char_frac_x1e4", "keep")
  }

  /**
   * Streaming PII redaction — the keep-but-scrub policy twin of
   * [[piiGate]] (which drops): the batch
   * [[graft.pipeline.Curation.piiRedact]] regexp_replace chain applied
   * map-side, emitting the scrubbed text plus per-type counts. Stateless
   * codegen column math, so a streamed document's redaction is
   * byte-identical to the batch redaction of the same row (gated
   * stream ≡ batch in StreamingSpec).
   */
  def redactStream(docs: DataFrame): DataFrame =
    graft.pipeline.Curation.piiSignals(docs)
      .withColumn("clean_text", graft.pipeline.Curation.piiRedact(col("text")))
      .select(col("doc_id"), col("ts"), col("clean_text"),
        col("n_emails"), col("n_urls"), col("n_ipv4"), col("n_phones"))

  /**
   * Streaming epoch/shard assignment — the stateless half of the batch
   * [[graft.pipeline.Assembly.epochPlan]] with tercile cuts trained
   * offline (the same deployed-model shape as [[nbScoreStream]]): score,
   * epoch repetition and LCG shard are all map-side column math, so a
   * streamed document lands on exactly the (epoch, shard) instances the
   * batch plan gives it (gated stream ≡ batch in StreamingSpec).
   */
  def epochAssignStream(docs: DataFrame, c1: Double, c2: Double,
                        nShards: Int, maxEpochs: Int = 3): DataFrame =
    graft.pipeline.Assembly.epochAssign(
      graft.pipeline.TextStats.qualityScore(docs)
        .select(col("doc_id"), col("ts"),
          (round(col("quality_score") * 1e4) / 1e4).as("score")),
      c1, c2, nShards, maxEpochs)

  /**
   * Rolling near-dup ingestion against the PERSISTED OPH index — the
   * streaming twin of the batch p52 path: each micro-batch is checked by
   * [[graft.pipeline.Dedup.nearDupAgainstIndex]] (index never moves, batch
   * broadcasts under the size guard), its dup pairs append to `pairsOut`,
   * and its own signatures append to the index so LATER batches see it.
   * Initialize the index once with `Dedup.writeNearDupIndex` (an empty
   * corpus is fine) before starting the stream.
   *
   * Delivery: foreachBatch is at-least-once on retry — a replayed batch
   * can append its pairs and signatures twice. Duplicate signatures only
   * re-create candidates the query dedups; duplicate PAIR rows are the
   * caller's dropDuplicates away (exactly-once would key the appends by
   * batchId, which parquet-without-a-metastore cannot express atomically).
   */
  /**
   * Streaming novelty gate at ingest — the deployment twin of the batch
   * [[graft.pipeline.TextStats.memorizationAudit]] family: each arriving
   * document scores its k-gram novelty against the PERSISTED gram index
   * (trained offline via `TextStats.writeGramIndex`), then its unseen
   * grams append to the index so later batches see earlier ones — the
   * same incremental-index contract as [[nearDupIngest]]. A refresh crawl
   * full of novel_frac ≈ 0 docs is re-crawl churn, not new data.
   *
   * Delivery: foreachBatch is at-least-once on retry — a replayed batch
   * can re-append grams if the left-anti append itself died mid-write;
   * readers stay correct because the known-count is a countDistinct over
   * matched grams, immune to duplicate index rows.
   */
  def noveltyIngest(docStream: DataFrame, indexDir: String, scoresOut: String,
                    checkpoint: String, k: Int = 5,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.pipeline.TextStats.noveltyAgainstIndex(batch, indexDir, k)
          .write.mode("append").parquet(scoresOut)
        graft.pipeline.TextStats.appendToGramIndex(batch, indexDir, k)
      }
      .start()

  /** Streaming maintenance of the p84/p86 term index: each micro-batch
    * appends its postings as segment batchId + 1 (seg 0 is the offline
    * build), so arriving documents become searchable between batches and
    * the segment numbering stays consistent with the merge-on-read
    * tombstone contract. Batch-sized work per trigger (the index never
    * rewrites); at-least-once replay re-appends a batch's postings —
    * exactly-once callers dedup via the checkpointed batchId segment
    * (replays reuse the SAME seg, so a tombstone (doc, seg) cut or a
    * distinct-on-(term,doc,seg) read heals duplicates — documented, same
    * contract as the near-dup pairs sink). */
  def termIndexIngest(docStream: DataFrame, indexDir: String,
                      checkpoint: String, buckets: Int = 64,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.TextStats.appendToTermIndex(
          batch, indexDir, seg = batchId + 1L, buckets = buckets)
      }
      .start()

  /** Streaming maintenance of the p91 shingle index — the
    * [[termIndexIngest]] contract applied to the pair-maintenance
    * artifact: each micro-batch appends its hashed-shingle postings and
    * set-size rows as segment batchId + 1, so arriving documents join the
    * next incremental pair refresh without an offline rebuild. Same
    * at-least-once semantics (replays reuse the SAME seg — a tombstone
    * cut heals duplicates). */
  def shingleIndexIngest(docStream: DataFrame, indexDir: String,
                         checkpoint: String,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.PairMaintenance.appendToShingleIndex(
          batch, indexDir, seg = batchId + 1L)
      }
      .start()

  /** Streaming maintenance of the p96 IVF-PQ vector index — the
    * [[termIndexIngest]] contract applied to ANN: each micro-batch of
    * arriving embeddings appends as segment batchId + 1, assigned to the
    * index's EXISTING centroids and encoded with the persisted codebooks
    * (read once at stream start — the add-after-train contract, so the
    * stream never trains). Arriving vectors are probe-visible between
    * batches; re-embeds/deletes record tombstones exactly as in batch
    * maintenance.
    *
    * At-least-once replay heals by IDEMPOTENCE, not serve-time dedup:
    * unlike the term-index read contract (which can distinct on
    * (term, doc, seg)), [[graft.pipeline.Similarity.ivfPqTopK]] has no
    * dedup pass — a same-seg duplicate row would rank the SAME
    * neighbor_id twice after a stream restart. So a replayed batch
    * checks its checkpointed segment first and re-appends ONLY when the
    * segment has no committed rows. Parquet's job commit is
    * all-or-nothing at the output-committer level (a failed append
    * leaves nothing visible), so `segment present` ⇒ the prior attempt
    * committed fully and the replay is a no-op. */
  def ivfIndexIngest(vecStream: DataFrame, indexPath: String,
                     codebooksPath: String, checkpoint: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val cb = graft.pipeline.Quantize.readCodebooks(
      vecStream.sparkSession, codebooksPath)
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ivfIngestBatch(batch, indexPath, cb, seg = batchId + 1L)
      }
      .start()
  }

  /** One idempotent IVF ingest step (the [[ivfIndexIngest]] batch body,
    * factored so the replay contract is directly testable): appends the
    * batch as `seg` when the segment is absent; a fully committed segment
    * makes the replay a no-op; a PARTIALLY visible segment (a prior
    * attempt died mid job-commit, or a v2 committer's per-task commits
    * landed a subset) fails LOUDLY — re-appending would duplicate rows
    * ivfPqTopK cannot heal, and skipping would silently drop the rest of
    * the batch forever. Recovery from a partial segment is the janitor:
    * tombstone-free compact of segs < N + a re-run of the batch. */
  private[graft] def ivfIngestBatch(batch: DataFrame, indexPath: String,
                                    cb: Array[Array[Array[Double]]],
                                    seg: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val existing = batch.sparkSession.read.parquet(s"$indexPath/corpus")
      .where(col("seg") === seg).count()
    if (existing == 0L)
      graft.pipeline.Similarity.appendToIvfIndex(batch, indexPath, cb, seg = seg)
    else {
      val expect = batch.count()
      require(existing == expect,
        s"ivfIngestBatch: segment $seg is PARTIALLY committed ($existing " +
          s"of $expect rows) — a prior attempt died mid-commit; compact " +
          "the index below this segment and re-run the batch")
    }
  }

  def nearDupIngest(docStream: DataFrame, indexDir: String, pairsOut: String,
                    checkpoint: String, threshold: Double = 0.9,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = graft.pipeline.Dedup.nearDupAgainstIndex(batch, indexDir, threshold = threshold)
        pairs.write.mode("append").parquet(pairsOut)
        graft.pipeline.Dedup.appendToNearDupIndex(batch, indexDir)
      }
      .start()

  private def dedupGroup(horizon: String)(
      key: String, rows: Iterator[DocEvent],
      state: GroupState[Long]): Iterator[DocEvent] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) {
      // hash already seen in an earlier batch — drain silently, keep the
      // original eviction deadline (re-arming it would let a duplicate
      // stream pin state forever)
      Iterator.empty
    } else if (!rows.hasNext) Iterator.empty
    else {
      val first = rows.reduceLeft((a, b) =>
        if (a.ts.getTime < b.ts.getTime ||
          (a.ts.getTime == b.ts.getTime && a.doc_id <= b.doc_id)) a else b)
      state.update(first.doc_id)
      state.setTimeoutTimestamp(first.ts.getTime, horizon)
      Iterator.single(first)
    }
  }
}
