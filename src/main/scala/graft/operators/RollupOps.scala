package graft.operators

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.{Column, DataFrame}

/** Pre-aggregated ROLLUP / CUBE — the grouping-sets evaluation order a
  * 100 TB fact table needs.
  *
  * Spark plans `df.rollup(dims).agg(...)` as `Expand` FIRST: every
  * input row is replicated once per grouping set (3 copies for a
  * 2-dim rollup, 4 for a 2-dim cube) and the whole multiplied stream
  * runs through the aggregation hash table. The map-side work — the
  * only part that grows with the fact table — is G× a plain GROUP BY,
  * for super-aggregate rows that are pure arithmetic consequences of
  * the finest level.
  *
  * For decomposable aggregates (sum/count/min/max — anything with an
  * associative merge) the algebra factors: aggregate ONCE at the
  * finest grouping (dims themselves; the same partial-agg + one tiny
  * exchange as a plain GROUP BY), then run Expand + re-aggregation on
  * the RESULT — |distinct dim combos| rows, not |fact| rows. The
  * grouping-set lattice is identical (a data-borne NULL dim value
  * forms its own finest-level group either way, and rolls up either
  * way), and each re-aggregated value merges exactly the partials the
  * direct plan would have folded row-by-row:
  *   count → sum of partial counts, sum → sum of partial sums,
  *   min/max → min/max of partial min/max.
  * So the output is row-for-row identical to the direct form — pinned
  * by OperatorSpec on data with NULL dim values, and by the unchanged
  * q19/q43 oracles — while the fact table pays one aggregation pass
  * instead of G.
  *
  * No reference analog (the reference delegates GROUP BY to DuckDB,
  * which aggregates grouping sets in one pass natively); this is the
  * Spark-planning counterpart of that evaluation strategy.
  */
object RollupOps {

  /** How a finest-level partial re-aggregates across grouping sets. */
  sealed trait ReAgg
  /** count / sum partials: add them. */
  case object ReSum extends ReAgg
  case object ReMin extends ReAgg
  case object ReMax extends ReAgg

  /** One output aggregate: `partial` evaluated at the finest grouping
    * level under `alias`, then folded across grouping sets by `re`.
    * The output column keeps `alias`.
    */
  final case class PreAgg(partial: Column, alias: String, re: ReAgg)

  def rollup(df: DataFrame, dims: Seq[String], aggs: Seq[PreAgg]): DataFrame =
    grouped(df, dims, aggs, cube = false)

  def cube(df: DataFrame, dims: Seq[String], aggs: Seq[PreAgg]): DataFrame =
    grouped(df, dims, aggs, cube = true)

  /** PreAgg is a CONTRACT — the partial must actually re-aggregate
    * under the declared fold, or the super-aggregate rows are silently
    * wrong (avg of avgs, count-distinct of counts). Unlike the
    * [[graft.plans.PreAggGroupingSets]] rule, which inspects resolved
    * plans and bails out, this API sees the partial before analysis —
    * so validate the declared shape here and fail loudly on misuse.
    * Recognized: bare `sum`/`count` (and the graft int128 decimal
    * sums) under ReSum, bare `min` under ReMin, bare `max` under
    * ReMax, never DISTINCT, never a wrapper around the aggregate (a
    * cast/arith wrapper applied at the finest level does not commute
    * with the re-fold).
    */
  private val reSumNames = Set("sum", "count", "graft_decimal_sum", "graft_decimal_sum_product")

  private def validate(a: PreAgg): Unit = {
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"PreAgg '${a.alias}': $what. Only decomposable partials fold correctly " +
        "across grouping sets (ReSum: sum/count, ReMin: min, ReMax: max); " +
        "avg/countDistinct/etc. would return wrong super-aggregate rows.")
    SparkBridge.convertedExpression(a.partial) match {
      case f: UnresolvedFunction =>
        val name = f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        if (f.isDistinct) fail(s"DISTINCT '$name' is not decomposable")
        val ok = a.re match {
          case ReSum => reSumNames.contains(name)
          case ReMin => name == "min"
          case ReMax => name == "max"
        }
        if (!ok) fail(s"partial '$name' does not re-aggregate under ${a.re}")
      case ae: AggregateExpression =>
        if (ae.isDistinct) fail("DISTINCT aggregate is not decomposable")
        val ok = (a.re, ae.aggregateFunction) match {
          case (ReSum, _: Sum | _: Count) => true
          case (ReSum, f) => reSumNames.contains(f.prettyName)
          case (ReMin, _: Min) => true
          case (ReMax, _: Max) => true
          case _ => false
        }
        if (!ok) fail(
          s"partial '${ae.aggregateFunction.prettyName}' does not re-aggregate under ${a.re}")
      case other => fail(
        s"partial is not a bare aggregate call (got ${other.getClass.getSimpleName})")
    }
  }

  private def grouped(
      df: DataFrame, dims: Seq[String], aggs: Seq[PreAgg],
      cube: Boolean): DataFrame = {
    require(dims.nonEmpty, "at least one grouping dimension")
    require(aggs.nonEmpty, "at least one aggregate")
    aggs.foreach(validate)
    val partials = aggs.map(a => a.partial.as(a.alias))
    val base = df.groupBy(dims.map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val finals = aggs.map { a =>
      val c = a.re match {
        case ReSum => sum(col(a.alias))
        case ReMin => min(col(a.alias))
        case ReMax => max(col(a.alias))
      }
      c.as(a.alias)
    }
    val g = if (cube) base.cube(dims.map(col): _*)
            else base.rollup(dims.map(col): _*)
    g.agg(finals.head, finals.tail: _*)
  }

  // NOTE deliberately absent: a `distinctAggTwoLevel` helper (GROUP BY
  // with COUNT(DISTINCT d) + decomposables hand-split into two
  // aggregates) was built and DELETED in r7 — Spark's one-distinct
  // physical planning already evaluates exactly that shape (partial on
  // (keys, d) → merge → distinct phases, no Expand, no row
  // replication; verified on the executed plan and measured equal),
  // so the helper added moving parts for nothing. Expand appears only
  // for aggregates over MULTIPLE different distinct children, which
  // no two-level split can express without changing semantics.
}
