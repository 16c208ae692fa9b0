package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Set-algebra over key sets drawn from the SAME source relation.
  *
  * `a.intersect(b).except(c)` is the right call when a/b/c are
  * genuinely different relations: Spark plans it as distinct +
  * left-semi / left-anti shuffle joins. But the common analytics
  * shape — membership sets that are all `σ_pred(T).select(key)` over
  * one table T — pays for that generality with one scan of T *per
  * set* plus one shuffle *per set operation* (3 scans + 3 exchanges
  * for (A ∩ B) \ C; the scans cannot be exchange-reused because each
  * carries a different pushed filter).
  *
  * Since INTERSECT/EXCEPT are distinct-set semantics, the whole
  * expression collapses to one boolean-flag aggregation:
  *
  *   keys k of T with  ∃ row: inPred_i(row)   for every include i
  *                and ¬∃ row: exPred_j(row)   for every exclude j
  *
  * i.e. ONE scan of T (filter = OR of all predicates, pushed to the
  * source), ONE hash aggregation keyed on `key` with max(pred)
  * flags (partial map-side, so the exchange carries at most
  * |distinct keys| × (#sets) bits), and a residual filter. At 100 TB
  * this is the difference between 3 full-table shuffles and one
  * key-width exchange. OperatorSpec pins result-equivalence with the
  * intersect/except composition on the same inputs.
  */
object SetAlgebra {

  /** Distinct `key` values of `df` that appear in EVERY `include`
    * predicate's row set and NONE of the `exclude` predicates'.
    * Equivalent to
    * `include.map(p => df.where(p).select(key)).reduce(_ intersect _)
    *   .except(exclude-sets union)` — in one scan + one exchange.
    */
  def sameSourceMembership(
      df: DataFrame,
      key: String,
      include: Seq[Column],
      exclude: Seq[Column] = Nil): DataFrame = {
    require(include.nonEmpty, "at least one include predicate")
    val all = include ++ exclude
    // rows matching no predicate contribute nothing: drop them at the
    // scan (the OR-disjunction pushes down to the source filter)
    val relevant = df.where(all.reduce(_ || _))
    val flags = include.zipWithIndex.map { case (p, i) =>
      max(when(p, 1).otherwise(0)).as(s"__in$i")
    } ++ exclude.zipWithIndex.map { case (p, j) =>
      max(when(p, 1).otherwise(0)).as(s"__ex$j")
    }
    val want = include.indices.map(i => col(s"__in$i") === 1) ++
      exclude.indices.map(j => col(s"__ex$j") === 0)
    relevant
      .groupBy(key)
      .agg(flags.head, flags.tail: _*)
      .where(want.reduce(_ && _))
      .select(key)
  }
}
