package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType}

/** Multi-dimensional Z-order (Morton) clustering: interleaves the bits
  * of min-max-normalized column ranks so that rows close in EVERY
  * clustered dimension land close in the sort order — and therefore in
  * the same files, with tight per-file min/max on ALL the dimensions
  * at once. 1-D sorted compaction gives perfect skipping on one column
  * and none on the others; Z-ordering trades a little of each for
  * useful skipping on all (the standard lakehouse OPTIMIZE ZORDER
  * trade).
  *
  * Numeric/timestamp columns only (rank normalization needs an order
  * embedding; strings would need a collation-aware prefix encode).
  */
object ZOrder {

  val BitsPerColumn = 16

  /** Order-preserving double embedding; TIMESTAMP_NTZ has no direct
    * numeric cast and routes through TIMESTAMP first.
    */
  def toDoubleCol(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType => c.cast("timestamp").cast("double")
    case _                => c.cast("double")
  }

  /** Builds the z-value expression for `cols`, normalizing each with
    * the provided (min, max) range. Pure column math — codegen'd,
    * map-side.
    */
  def zvalue(cols: Seq[(Column, DataType)], ranges: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size <= 3, "z-order supports 1-3 columns")
    val maxVal = (1L << BitsPerColumn) - 1
    val scaled = cols.zip(ranges).map { case ((c, dt), (mn, mx)) =>
      val span = if (mx > mn) mx - mn else 1.0
      least(greatest(
        ((toDoubleCol(c, dt) - lit(mn)) / lit(span) * lit(maxVal.toDouble)).cast("long"),
        lit(0L)), lit(maxVal))
    }
    val n = cols.size
    (0 until BitsPerColumn).flatMap { b =>
      scaled.zipWithIndex.map { case (sc, ci) =>
        shiftleft(shiftright(sc, b).bitwiseAND(lit(1L)), b * n + ci)
      }
    }.reduce(_ + _)
  }

  /** Computes per-column (min, max) in one aggregation pass. */
  def ranges(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap { c =>
      val nc = toDoubleCol(col(c), df.schema(c).dataType)
      Seq(min(nc).as(s"__mn_$c"), max(nc).as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (_, i) =>
      (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }
}
