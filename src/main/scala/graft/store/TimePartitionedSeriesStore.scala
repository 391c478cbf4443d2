package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Time-partitioned Parquet series store — the 100 TB scan story for the
 * batch side, mirroring what the streaming ingest already does
 * (`streaming/Ingest.scala` partitionBy("day")). The layout shards every
 * series row at `windowSec` boundaries and writes `partitionBy("pwin")`,
 * so a [from, until) fetch prunes whole directories before any row is
 * read — Spark's partition pruning is the engine analog of the
 * reference's TLD path routing + time-range fetch
 * (ref pathcache/pathcache.go:18-56, SURVEY §4): route the request to the
 * slice of the store that can contain it, never scan the rest.
 *
 * fetch() returns the same canonical frame as the flat
 * [[ParquetSeriesStore]]: one row per series covering the requested
 * range. Reassembly (stitching window shards back into one values array)
 * groups only the PRUNED rows — the shuffle is proportional to the
 * requested window, not the store. Missing middle shards (a series with
 * no row in some window) NaN-fill, so a reassembled series is
 * value-identical to the flat layout's slice.
 */
class TimePartitionedSeriesStore(
    path: String,
    windowSec: Long,
    uniformStep: Option[Long] = None) extends SeriesStore {

  override def stepHint: Option[Long] = uniformStep

  private def pruned(spark: SparkSession, from: Long, until: Long): DataFrame = {
    val df = TimePartitionedSeriesStore.readShardedOrEmpty(spark, path)
    // partition predicate from the request range: floorDiv keeps negative
    // timestamps on the correct window (SQL DIV is floor division too)
    val lo = if (SeriesStore.bounded(from)) Some(Math.floorDiv(from, windowSec)) else None
    val hi = if (SeriesStore.bounded(until)) Some(Math.floorDiv(until - 1L, windowSec)) else None
    (lo, hi) match {
      case (Some(l), Some(h)) => df.where(col("pwin") >= l && col("pwin") <= h)
      case (Some(l), None)    => df.where(col("pwin") >= l)
      case (None, Some(h))    => df.where(col("pwin") <= h)
      case _                  => df
    }
  }

  override def fetch(spark: SparkSession, pathExpr: String, from: Long, until: Long): DataFrame = {
    val named = SeriesStore.nameFilter(pruned(spark, from, until), pathExpr)
    TimePartitionedSeriesStore.stitch(
      SeriesStore.sliceToRange(
        named.where(col("start") + size(col("values")) * col("step") > from && col("start") < until),
        from, until))
      .withColumn("pathExpression", lit(pathExpr))
  }

  override def fetchAll(spark: SparkSession, from: Long, until: Long): DataFrame =
    TimePartitionedSeriesStore.stitch(
      SeriesStore.sliceToRange(
        pruned(spark, from, until)
          .where(col("start") + size(col("values")) * col("step") > from && col("start") < until),
        from, until))
      .withColumn("pathExpression", lit("*"))

  /** The persisted `_catalog` table when the writer/rollover maintains one
    * (catalog-sized read — no data partition is listed or opened);
    * otherwise the 2-column pruned scan over the shards. */
  override def catalog(spark: SparkSession): DataFrame =
    TimePartitionedSeriesStore.readCatalog(spark, path).getOrElse(
      TimePartitionedSeriesStore.readShardedOrEmpty(spark, path)
        .select(col("name"), col("tags")).dropDuplicates("name"))
}

object TimePartitionedSeriesStore {

  /** The sharded layout's row schema, for reading a store that is
    * currently EMPTY: a retention rollover that moves every window
    * deletes all `pwin=` partition dirs, and `spark.read.parquet` on a
    * dir with no data files throws "unable to infer schema" instead of
    * returning an empty relation. The schema is fixed (SURVEY §1.4), so
    * an empty store reads as an empty frame. */
  private[store] val shardedSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "name STRING, tags MAP<STRING,STRING>, start BIGINT, step BIGINT, " +
        "values ARRAY<DOUBLE>, pwin BIGINT")

  /** Read the sharded dir, or an empty canonical frame when no partition
    * dir exists (fresh store, or a fully-rolled fine tier). The partition
    * check is any `col=` subdir, covering both the `pwin=` layout and the
    * routed `troute=`/`pwin=` one. */
  private[store] def readShardedOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType = shardedSchema): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasShards = fs.exists(root) &&
      fs.listStatus(root).exists(st => st.isDirectory && st.getPath.getName.contains("="))
    if (hasShards) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /**
   * Split canonical series rows at `windowSec` boundaries and write
   * Parquet partitioned by the window ordinal `pwin = floor(t /
   * windowSec)`. Each shard keeps the canonical row shape (name, tags,
   * start, step, values) so readers slice with the same index math as the
   * flat store. The per-row explode is map-side; the writer's
   * `partitionBy` is the only data movement.
   */
  def write(df: DataFrame, path: String, windowSec: Long): Unit = {
    shard(df, windowSec).write.mode("overwrite").partitionBy("pwin").parquet(path)
    writeCatalog(df.select(col("name"), col("tags")), path)
  }

  // ---- persisted name/tag catalog -----------------------------------------
  // The `_catalog` table under the store root (underscore-prefixed, so the
  // data reader never lists it as a partition) holds distinct (name, tags).
  // It is the reference's pathcache content made durable: find/expand/tags
  // read IT instead of scanning the store (pathcache/pathcache.go:18-56 —
  // the path→backend index that answers finds without fanning out).

  private[store] def catalogPath(path: String) = s"$path/_catalog"

  /** The persisted catalog, if this store dir has one. */
  private[store] def readCatalog(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(catalogPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
      Some(spark.read.parquet(catalogPath(path)))
    else None
  }

  /** (Re)write the catalog from a names frame. Writes to a temp dir and
    * renames into place, so a concurrent reader sees the old catalog or the
    * new one, never a half-written dir — and so the input may itself be the
    * old catalog (union-append), which an in-place overwrite would corrupt. */
  private[store] def writeCatalog(names: DataFrame, path: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(catalogPath(path))
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_catalog_tmp")
    names.select(col("name"), col("tags")).dropDuplicates("name")
      .coalesce(1) // catalog-sized output: one file per store
      .write.mode("overwrite").parquet(tmp.toString)
    val fs = dst.getFileSystem(names.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** Add names to the catalog without scanning the store: old catalog ∪
    * batch, catalog-sized work. Creates the catalog if absent. */
  private[store] def appendCatalog(spark: SparkSession, path: String, names: DataFrame): Unit = {
    val add = names.select(col("name"), col("tags"))
    writeCatalog(readCatalog(spark, path).map(_.unionByName(add)).getOrElse(add), path)
  }

  /** Rebuild the catalog from the store's current data (2-column pruned
    * scan) — the post-delete refresh a rollover uses on the fine tier. */
  private[store] def refreshCatalog(spark: SparkSession, path: String): Unit =
    writeCatalog(readShardedOrEmpty(spark, path).select(col("name"), col("tags")), path)

  /** Exact floor-division window ordinal in INTEGER column math — the
    * double-precision floor(col/w) rounds for |t| beyond 2⁵³ and could
    * disagree with the reader's Math.floorDiv by ±1 window; (t - pmod) is
    * an exact multiple of w and SQL `div` is integral, so no double ever
    * enters. */
  private def winOf(t: Column, windowSec: Long): Column =
    call_function("div", t - pmod(t, lit(windowSec)), lit(windowSec))

  /** The sharding transform behind [[write]], exposed for tests. */
  def shard(df: DataFrame, windowSec: Long): DataFrame = {
    val w = lit(windowSec)
    df
      .withColumn("_end", col("start") + size(col("values")).cast("long") * col("step"))
      .withColumn("pwin",
        explode(sequence(winOf(col("start"), windowSec),
          winOf(col("_end") - 1L, windowSec))))
      // grid indices of this window's slice: lo = ceil((winStart-start)/step)
      // clamped to [0, n]; hi = ceil((winEnd-start)/step) clamped likewise
      .withColumn("_ws", col("pwin") * w)
      .withColumn("_lo", greatest(lit(0L),
        -floor((col("start") - col("_ws")) / col("step")).cast("long")))
      .withColumn("_hi", least(size(col("values")).cast("long"),
        -floor((col("start") - (col("_ws") + w)) / col("step")).cast("long")))
      .where(col("_hi") > col("_lo"))
      .withColumn("values",
        slice(col("values"), (col("_lo") + 1).cast("int"), (col("_hi") - col("_lo")).cast("int")))
      .withColumn("start", col("start") + col("_lo") * col("step"))
      .drop("_end", "_ws", "_lo", "_hi")
  }

  /**
   * Reassemble window shards into one row per series: sort shards by
   * start, concatenate values, NaN-fill any whole-window gap between
   * shards. Runs AFTER partition pruning + range slicing, so the groupBy
   * shuffles only the rows of the requested window. Pure HOF column math
   * per group — no UDF, no collect.
   */
  private[store] def stitch(shards: DataFrame): DataFrame = {
    val acc0: Column = struct(
      lit(null).cast("long").as("end"),
      lit(Array.empty[Double]).as("vals"))
    shards
      .groupBy(col("name"))
      .agg(
        first(col("tags")).as("tags"),
        first(col("step")).as("step"),
        min(col("start")).as("start"),
        array_sort(collect_list(struct(col("start").as("s"), col("values").as("v")))).as("_shards"))
      .withColumn("values",
        aggregate(
          col("_shards"),
          acc0,
          (acc, sh) => struct(
            (sh("s") + size(sh("v")).cast("long") * col("step")).as("end"),
            concat(
              acc("vals"),
              when(acc("end").isNull, lit(Array.empty[Double]))
                .otherwise(array_repeat(lit(Double.NaN),
                  ((sh("s") - acc("end")) / col("step")).cast("int"))),
              sh("v")).as("vals")),
          acc => acc("vals")))
      .drop("_shards")
      .select(col("name"), col("tags"), col("start"), col("step"), col("values"))
  }
}
