package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Glob
import graft.store.SeriesStore

/** One /metrics/find result node. (ref find_handlers.go treejson shaping) */
case class FindNode(id: String, text: String, leaf: Boolean, allowChildren: Boolean)

/**
 * The metadata surface: /metrics/find, /metrics/expand, /tags autocomplete.
 * All are DISTINCT-over-names/tags queries against the store scan — the
 * hierarchy derivation (child truncation at the query's depth, leaf flags)
 * runs as column expressions before the collect, so only result nodes reach
 * the driver. (ref cmd/carbonapi/http/find_handlers.go:120-373,
 * tags_handler.go:22-128)
 */
object Catalog {

  private def names(spark: SparkSession, store: SeriesStore): DataFrame =
    store.fetchAll(spark, Long.MinValue / 4, Long.MaxValue / 4)
      .select(col("name")).distinct()

  /**
   * /metrics/find?query=GLOB: nodes at the query's depth. A node is a leaf
   * if a series ends exactly there, and allowChildren if deeper series
   * exist under it (both can hold — e.g. `a.b` and `a.b.c` both stored).
   */
  def find(spark: SparkSession, store: SeriesStore, query: String): Seq[FindNode] = {
    val depth = query.count(_ == '.') + 1
    val all = names(spark, store)
    val matched = all
      .withColumn("prefix", concat_ws(".", slice(split(col("name"), "\\."), 1, depth)))
      .where(if (Glob.isGlob(query)) col("prefix").rlike(Glob.toRegex(query))
             else col("prefix") === query)
      .groupBy(col("prefix"))
      .agg(
        max(when(size(split(col("name"), "\\.")) === depth, 1).otherwise(0)).as("leaf"),
        max(when(size(split(col("name"), "\\.")) > depth, 1).otherwise(0)).as("children"))
      .orderBy(col("prefix"))
    matched.collect().toSeq.map { r =>
      val p = r.getString(0)
      FindNode(p, p.split('.').last, r.getInt(1) == 1, r.getInt(2) == 1)
    }
  }

  /** /metrics/expand?query=GLOB: all node paths matching the glob at its
    * own depth (no leaf shaping). */
  def expand(spark: SparkSession, store: SeriesStore, query: String): Seq[String] = {
    val depth = query.count(_ == '.') + 1
    names(spark, store)
      .withColumn("prefix", concat_ws(".", slice(split(col("name"), "\\."), 1, depth)))
      .where(if (Glob.isGlob(query)) col("prefix").rlike(Glob.toRegex(query))
             else col("prefix") === query)
      .select(col("prefix")).distinct().orderBy(col("prefix"))
      .collect().toSeq.map(_.getString(0))
  }

  /** One parsed `expr=` tag filter: tag=value, tag!=value, tag=~re,
    * tag!=~re — the graphite tag-query operators (ref tags_handler.go and
    * graphite-web's /tags/autoComplete API). */
  private def exprPredicate(e: String): org.apache.spark.sql.Column = {
    val (k, op, v) = Seq("!=~", "=~", "!=", "=")
      .collectFirst { case o if e.contains(o) =>
        val i = e.indexOf(o); (e.take(i), o, e.drop(i + o.length)) }
      .getOrElse(throw new IllegalArgumentException(s"bad tag expr: $e"))
    val tv = element_at(col("tags"), k)
    op match {
      case "="   => tv === v
      case "!="  => tv.isNull || tv =!= v
      case "=~"  => tv.isNotNull && tv.rlike(v)
      case "!=~" => tv.isNull || !tv.rlike(v)
    }
  }

  private def taggedSeries(spark: SparkSession, store: SeriesStore,
                           exprs: Seq[String]): DataFrame = {
    val all = store.fetchAll(spark, Long.MinValue / 4, Long.MaxValue / 4)
    if (exprs.isEmpty) all
    else all.where(exprs.map(exprPredicate).reduce(_ && _))
  }

  /** /tags/autoComplete/tags: distinct tag keys across series matching the
    * optional `expr=` filters, EXCLUDING keys the filters already name
    * (graphite-web autocomplete semantics), optional prefix filter. */
  def tagNames(spark: SparkSession, store: SeriesStore,
               tagPrefix: String = "", limit: Int = 100,
               exprs: Seq[String] = Nil): Seq[String] = {
    val inExpr = exprs.flatMap(e => Seq("!=~", "=~", "!=", "=")
      .collectFirst { case o if e.contains(o) => e.take(e.indexOf(o)) })
    val tags = taggedSeries(spark, store, exprs)
      .select(explode(map_keys(col("tags"))).as("tag"))
    val noExprTags =
      if (inExpr.isEmpty) tags else tags.where(!col("tag").isin(inExpr: _*))
    val filtered =
      if (tagPrefix.isEmpty) noExprTags
      else noExprTags.where(col("tag").startsWith(tagPrefix))
    filtered.distinct().orderBy(col("tag")).limit(limit).collect().toSeq.map(_.getString(0))
  }

  /** /tags/autoComplete/values: distinct values of one tag key across
    * series matching the optional `expr=` filters. */
  def tagValues(spark: SparkSession, store: SeriesStore, tag: String,
                valuePrefix: String = "", limit: Int = 100,
                exprs: Seq[String] = Nil): Seq[String] = {
    val vals = taggedSeries(spark, store, exprs)
      .select(element_at(col("tags"), tag).as("v")).where(col("v").isNotNull)
    val filtered = if (valuePrefix.isEmpty) vals else vals.where(col("v").startsWith(valuePrefix))
    filtered.distinct().orderBy(col("v")).limit(limit).collect().toSeq.map(_.getString(0))
  }

  /** treejson marshalling of find results. (ref find_handlers.go:41-103) */
  def treeJson(nodes: Seq[FindNode]): String =
    nodes.map { n =>
      val ac = if (n.allowChildren) 1 else 0
      val leaf = if (n.leaf) 1 else 0
      s"""{"allowChildren":$ac,"expandable":$ac,"leaf":$leaf,"id":"${n.id}","text":"${n.text}","context":{}}"""
    }.mkString("[", ",", "]")

  /** List of supported function names (the /functions endpoint's key set). */
  def functions: Seq[String] = graft.engine.Eval.registry.keys.toSeq.sorted
}
