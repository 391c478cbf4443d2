package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-target scan batching measurement (SURVEY §4 "batch all leaves into
 * one backend round-trip", ref expr/expr.go:36-96): a k-target render can
 * either scan the store once per leaf pattern and union the frames (the
 * per-pattern shape), or run ONE scan filtered by the OR of every pattern's
 * predicate and tag matches per pattern ([[graft.store.SeriesStore.fetchMulti]]).
 * This main times both shapes on the routed AND flat layouts and prints one
 * JSON line — the numbers behind BASELINE.md's recorded default.
 *
 * Usage: runMain graft.FetchBench  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
 * SPARK_GRAFT_REPS, SPARK_GRAFT_TARGETS=k)
 */
object FetchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_TARGETS", "10").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val frame = new graft.store.EventSeriesStore(sfDir).allSeries(spark)
      .select(col("name"), col("tags"), col("start"), col("step"), col("values"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_fetchbench").toString
    val routedDir = s"$tmp/routed"
    val flatDir = s"$tmp/flat"
    graft.store.RoutedSeriesStore.write(frame, routedDir, 86400L)
    graft.store.ParquetSeriesStore.write(frame, flatDir)
    val routed = new graft.store.RoutedSeriesStore(routedDir, 86400L, 1, Some(3600L))
    val flat = new graft.store.ParquetSeriesStore(flatDir, Some(3600L))

    // k single-series patterns + their glob forms, derived from the catalog
    // (a Grafana dashboard fans out exactly like this: many concrete
    // targets, a few wildcards)
    val names = routed.catalog(spark).select("name").orderBy("name")
      .limit(k).collect().map(_.getString(0)).toSeq
    require(names.size >= 2, s"need >= 2 series at $sfDir, got ${names.size}")
    // exact + progressively shorter prefix-globs per name (so k names
    // yield up to 4k distinct targets — the Grafana-dashboard shape:
    // mostly concrete targets, some wildcards)
    val patterns = (names ++
      (1 to 3).flatMap(cut => names.collect {
        case n if n.length > cut => n.take(n.length - cut) + "*"
      })).distinct.take(k)
    val from = 1704067200L
    val until = from + 14L * 86400L

    def time(label: String, body: => Long): (String, Double, Long) = {
      var rows = 0L
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); rows = body; (System.nanoTime() - t0) / 1e9
      }.min
      (label, best, rows)
    }
    def perPattern(store: graft.store.SeriesStore): Long =
      patterns.map(store.fetch(spark, _, from, until))
        .reduce(_ unionByName _).count()
    def batched(store: graft.store.SeriesStore): Long =
      store.fetchMulti(spark, patterns, from, until).count()

    val results = Seq(
      time("routed_per_pattern", perPattern(routed)),
      time("routed_batched", batched(routed)),
      time("flat_per_pattern", perPattern(flat)),
      time("flat_batched", batched(flat)))
    // the two shapes must agree before the timing means anything
    val a = routed.fetchMulti(spark, patterns, from, until)
      .select("name", "pathExpression").collect().map(_.toString).sorted
    val b = patterns.map(routed.fetch(spark, _, from, until))
      .reduce(_ unionByName _).select("name", "pathExpression")
      .collect().map(_.toString).sorted
    require(a.sameElements(b), s"shape mismatch: batched ${a.length} rows vs union ${b.length}")
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val body = results.map { case (l, s, r) => s""""$l":{"sec":${f3(s)},"rows":$r}""" }
      .mkString(",")
    spark.stop()
    println(s"""{"metric":"fetch_batching","targets":${patterns.size},"reps":$reps,$body,"sf":"$sfDir"}""")
  }
}
