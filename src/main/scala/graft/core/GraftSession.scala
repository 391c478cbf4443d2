package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Canonical SparkSession settings for the engine.
 *
 *  - `nanosAsLong`: the testdata `events.ts` is parquet TIMESTAMP(NANOS),
 *    which vanilla Spark 4 otherwise refuses to read — exposed as LongType
 *    nanoseconds (handled by the stores).
 *  - ANSI off: Graphite/DuckDB-parity permissive math (missing map key →
 *    NULL, double /0 → ±Inf) instead of runtime errors.
 *  - shuffle.partitions sized to cores (local mode), AQE on for runtime
 *    coalescing/skew handling — at cluster scale these become per-job
 *    tuning, the plans themselves don't change.
 */
object GraftSession {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // native sketch expressions (minhash_sig / simhash_fp) via the
      // sanctioned injectFunction extension point
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.mergeSchema", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
}
