package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Glob, Series}
import graft.store.{SeriesStore, StoreFetchException}

/**
 * One canned series, mirroring the reference mockbackend's metric entries
 * (ref cmd/mockbackend/render.go:100-150): `step` defaults to 1 and
 * `startTime` defaults to `step` when unset, exactly like the mock.
 */
case class MockSeries(name: String, values: Seq[Double],
                      step: Long = 0, start: Long = 0) {
  def stepN: Long = if (step == 0) 1 else step
  def startN: Long = if (start == 0) stepN else start
  /** Graphite tagged-name parsing: `m;tag1=v1;;tag4=v4` → name tag `m`,
    * tag1=v1, tag4=v4 (empty / '='-less segments skipped). */
  def tags: Map[String, String] = {
    val segs = name.split(';')
    Map("name" -> segs.head) ++ segs.tail.filter(_.contains('=')).map { s =>
      val i = s.indexOf('='); s.take(i) -> s.drop(i + 1)
    }
  }
}

sealed trait MockExpr
/** The backend answers this path expression with these series. */
case class MockData(series: MockSeries*) extends MockExpr
/** The backend fails this path expression with an upstream HTTP error —
  * stands in for the mock's `code:`/`replyDelayMS:` behaviors (a reply
  * slower than the render timeout surfaces as 504 "timeout while fetching
  * Response" in the reference; ref zipper/helper/errors.go:15-29). */
case class MockFail(code: Int, message: String) extends MockExpr

/**
 * In-memory twin of the reference's mockbackend for HTTP-level scenario
 * tests (ref cmd/mockbackend/testcases). Lookup is by EXACT path
 * expression first (the mock's `expressions:` map works the same way);
 * an undefined expression falls back to glob-matching the defined series
 * names, and a no-match yields an empty fetch (the backend 404 that the
 * default config masks to "no data"). The requested [from,until) range is
 * deliberately IGNORED — the mock replies with its configured window no
 * matter what was asked (ref render.go ignores the request range too).
 */
class MockBackendStore(exprs: Map[String, MockExpr]) extends SeriesStore {

  /** Total-outage injection (connection-refused / tag-backend failures):
    * every fetch and tag scan throws until cleared. */
  @volatile var failAll: Option[(Int, String)] = None

  private def frame(spark: SparkSession, ss: Seq[MockSeries], pathExpr: String): DataFrame = {
    val sp = spark
    import sp.implicits._
    if (ss.isEmpty)
      graft.engine.Eval.emptyFrame(spark).withColumn("pathExpression", lit(pathExpr))
    else
      ss.map(m => Series(m.name, m.tags, m.startN, m.stepN, m.values.toArray)).toDF()
        .withColumn("pathExpression", lit(pathExpr))
  }

  private def boom(): Unit =
    failAll.foreach { case (c, m) => throw new StoreFetchException(c, m) }

  private def allSeries: Seq[MockSeries] =
    exprs.values.collect { case d: MockData => d.series }.flatten
      .groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)

  override def fetch(spark: SparkSession, pathExpr: String, from: Long, until: Long): DataFrame = {
    boom()
    exprs.get(pathExpr) match {
      case Some(MockFail(c, m))   => throw new StoreFetchException(c, m)
      case Some(d: MockData)      => frame(spark, d.series, pathExpr)
      case None =>
        val rx = Glob.toRegex(pathExpr).r
        frame(spark, allSeries.filter(s => rx.matches(s.name.split(';').head)), pathExpr)
    }
  }

  override def fetchAll(spark: SparkSession, from: Long, until: Long): DataFrame = {
    boom()
    frame(spark, allSeries, "*")
  }
}
