package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Ingest

/** End-to-end micro-batch ingest: events parquet → streaming hourly rollup
  * → parquet sink → canonical series frame, compared against the batch
  * fixture derivation on the same input. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streamed rollup matches the batch fixture derivation") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$tmp/events"
    val outDir = s"$tmp/points"
    val ckDir = s"$tmp/ck"

    // stage the sf0.001 events as the stream source (ts is TIMESTAMP(NANOS)
    // read as long under nanosAsLong — convert to a real timestamp column)
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ev = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_seconds(expr("ts DIV 1000000000")))
      case _ => raw
    }).select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(srcDir)

    val q = Ingest.writer(
      Ingest.hourlyRollup(Ingest.eventStream(spark, srcDir)),
      outDir, ckDir).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select(col("name"), col("ts"), round(col("value"), 6).as("v"))
    val batch = graft.core.SeriesFrame.toPoints(
        graft.store.EventSeriesStore.build(spark, "/root/testdata/sf0.001", 3600L))
      .select(col("name"), col("ts"), round(col("value"), 6).as("v"))
    // windows still inside the watermark at end-of-stream stay in state and
    // are not emitted (append semantics) — compare only finalized buckets
    val maxTs = ev.agg(max(unix_timestamp(col("ts")))).head().getLong(0)
    val finalized = batch.where(col("ts") + 3600 < maxTs - 7200 - 3600)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty, "streamed rows must match batch values")
    assert(finalized.except(streamed).isEmpty, "all watermark-finalized buckets must be emitted")
  }
}
