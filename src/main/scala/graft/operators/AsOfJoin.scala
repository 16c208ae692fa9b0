package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively:
  * for each left row, the most recent right row with the same keys and
  * `right.ts <= left.ts` (ties at equal ts match, like DuckDB/kdb
  * ASOF semantics); left rows with no prior right row keep NULLs.
  *
  * Implementation is the union + ordered-window formulation, per the
  * custom-operator preference order (compose built-ins first —
  * SURVEY.md §7.4): tag each side, union on (keys, ts, side), and take
  * `last(right_payload, ignoreNulls)` over an ordered window. This
  * costs ONE shuffle of |L|+|R| rows — versus the naive
  * range-join + groupBy-max which shuffles the |L|×|R_key| range
  * blowup. At 100 TB the window sort is the same partitioning a
  * sort-merge join would need, with no pair explosion; skewed keys
  * shard like any window (salt the key if one entity dominates).
  *
  * Right rows must be unique per (keys, ts) — pre-aggregate otherwise
  * (duplicate right timestamps make ASOF ambiguous in every engine).
  */
object AsOfJoin {

  /** @param rightValueCols right columns to carry (besides keys/ts). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightValueCols: Seq[String],
      rightTsAs: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightStruct = StructType(
      right.select((rightTsCol +: rightValueCols).map(col): _*).schema.fields)

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rightStruct).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
        struct((rightTsCol +: rightValueCols).map(col): _*).as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          Seq(col(s"__match.$rightTsCol").as(rightTsAs)) ++
          rightValueCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
