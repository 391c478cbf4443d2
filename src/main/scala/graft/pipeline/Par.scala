package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive input spreading (r17, guide §2.5 "input skew" /§6).
 *
 * A small corpus arrives as ONE parquet row group → one scan partition, so
 * every map-heavy expression chain (shingling, tokenization, regex metrics,
 * vector math) runs single-threaded however many cores the session has —
 * measured as the dominant cost of the document/embedding operators at the
 * bench SFs. A production corpus arrives as many splits and must NOT pay a
 * gratuitous full exchange. So: round-robin repartition to the session
 * parallelism exactly when the plan's scan partitioning is BELOW it, derived
 * from the actual plan rather than a constant — at scale this is a no-op
 * decided per input, locally it unlocks the cores.
 *
 * Only safe for operators whose output is partition-order independent
 * (per-row maps, integer-quantized aggregates, canonical-key joins — the
 * repo-wide determinism discipline). Callers are each oracle-gated.
 */
object Par {
  def spread(df: DataFrame): DataFrame = {
    // streaming frames can't be inspected via .rdd (and micro-batch
    // partitioning is the source's business) — pass them through untouched
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
