package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Relational idioms that need a scale-safe decomposition on Spark.
 */
object SqlOps {

  /**
   * SQL's three-valued `probe.key NOT IN (SELECT subKey FROM sub)`,
   * decomposed into plans that never degenerate: Spark's literal NOT IN
   * becomes a null-aware anti join ONLY when the subquery side fits a
   * broadcast, and falls back to a corpus-sized BroadcastNestedLoopJoin
   * otherwise. The standard's semantics split cleanly instead:
   *
   *  1. a NULL probe never qualifies → `isNotNull` filter, pushed to scan;
   *  2. ANY NULL in the subquery empties the result → a 1-row has-null
   *     aggregate, broadcast as a filter flag (max over zero rows is NULL,
   *     so an EMPTY subquery keeps every probe — NOT IN () is true);
   *  3. the remainder is a plain hash LEFT ANTI equijoin on the key.
   *
   * Every piece is hash-partitioned or 1-row; nothing nest-loops over data.
   */
  def notIn(probe: DataFrame, probeKey: Column,
            sub: DataFrame, subKey: Column): DataFrame = {
    val flag = sub.agg(max(subKey.isNull).as("_subHasNull"))
    probe.where(probeKey.isNotNull)
      .crossJoin(broadcast(flag))
      .where(!coalesce(col("_subHasNull"), lit(false)))
      .drop("_subHasNull")
      .join(sub.where(subKey.isNotNull).select(subKey.as("_nik")),
        probeKey === col("_nik"), "left_anti")
  }
}
