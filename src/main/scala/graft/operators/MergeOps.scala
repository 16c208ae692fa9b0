package graft.operators

import graft.core.UserException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Relational semantics of the reference's write modes, expressed as
  * pure DataFrame → DataFrame operators so they can be oracle-checked
  * independently of any sink.
  *
  * - upsert ≡ the generated `MERGE INTO ... WHEN MATCHED UPDATE all
  *   WHEN NOT MATCHED INSERT all` (U3,
  *   /root/reference/src/component.py:238-260). With update-all /
  *   insert-all and no extra predicates, MERGE reduces to:
  *   source ∪ (target ⟕̸ source)  — all source rows plus target rows
  *   with no key match (anti join). The UPDATE SET even includes the
  *   PK columns themselves (:245) — reproduced trivially by taking
  *   the whole source row.
  * - append ≡ UNION ALL (U2); with schema evolution = union by name
  *   with nulls for missing columns (schema_mode="merge", :97).
  * - overwrite ≡ source (U1, truncate-by-recreate).
  *
  * Scale notes: the anti join shuffles on the PK — exactly what a
  * 1000-executor MERGE does. Callers with a small source should wrap
  * it in `broadcast()`; the lake-level merge (graft.lake) does file
  * pruning first so only touched files join.
  */
object MergeOps {

  /** MERGE upsert. Requires non-empty keys (the reference raises a
    * UserException when the manifest has no PKs, component.py:241-242).
    * Null-key source rows never match (`NULL = NULL` is not true in
    * the generated SQL's ON clause) and therefore insert — reproduced
    * by the null-safe-free equi-join below.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    if (keys.isEmpty)
      throw UserException(
        "Upsert mode requires primary keys to be defined in the table manifest.")
    val cols = target.columns.toSeq
    val joinCond = keys.map(k => target(k) === source(k)).reduce(_ && _)
    val untouched = target.join(source, joinCond, "left_anti")
    untouched.unionByName(source.select(cols.map(col): _*))
  }

  /** Append with schema evolution (schema_mode="merge"): union by
    * name, adding nulls for columns present on only one side.
    */
  def appendMergeSchema(target: DataFrame, source: DataFrame): DataFrame =
    target.unionByName(source, allowMissingColumns = true)

  /** Plain append — schemas must already line up by name. */
  def append(target: DataFrame, source: DataFrame): DataFrame =
    target.unionByName(source)

  /** Overwrite: the result is just the (cast) source; exposed for
    * symmetry so mode dispatch is total.
    */
  def overwrite(target: DataFrame, source: DataFrame): DataFrame = {
    val _ = target
    source
  }

  /** Keboola input-mapping pre-filter (SURVEY.md §2.11) — optional
    * platform-side semantics: where col IN (values), column projection,
    * row limit.
    */
  def inputMappingFilter(
      df: DataFrame,
      whereColumn: Option[String],
      whereValues: Seq[String],
      columns: Seq[String],
      limit: Option[Int]): DataFrame = {
    var out = df
    whereColumn.foreach { c =>
      out = out.where(col(c).cast("string").isin(whereValues.map(lit): _*))
    }
    if (columns.nonEmpty) out = out.select(columns.map(col): _*)
    limit.foreach(n => out = out.limit(n))
    out
  }
}
