package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-encoding-robust event-time projections.
  *
  * The synthetic `events.ts` column has shipped under two parquet
  * encodings across testdata generations: TIMESTAMP(NANOS) — which
  * Spark 4 can only read as raw-nanos LongType under
  * `spark.sql.legacy.parquet.nanosAsLong` (see SparkEntry.configure) —
  * and TIMESTAMP(MICROS) without UTC adjustment, which reads as
  * TIMESTAMP_NTZ. Query logic must not care: these helpers inspect the
  * bound schema once at plan time and emit the exact integer path for
  * whichever encoding is present (nanos epoch values exceed 2^53, so
  * the long path must never round-trip through DOUBLE).
  *
  * The DuckDB oracle side needs no branch: `epoch_ms(ts)` accepts both
  * TIMESTAMP_NS and naive TIMESTAMP, and naive timestamps are treated
  * as UTC instants — matched here by casting NTZ through the session
  * zone, which SparkEntry pins to UTC.
  */
object TimeFunctions {

  /** Epoch milliseconds (BIGINT) of `tsCol` in `df`, whatever its
    * physical encoding. `DIV` (floor division) on the nanos path and
    * `unix_millis` (truncation toward past) on the timestamp path
    * agree because the generator emits non-negative epochs.
    */
  def epochMs(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType           => expr(s"$tsCol DIV 1000000")
      case TimestampNTZType   => unix_millis(col(tsCol).cast(TimestampType))
      case _                  => unix_millis(col(tsCol))
    }

  /** UTC calendar day of `tsCol`, robust the same way (a raw-nanos
    * LongType would silently `to_date` to NULL otherwise).
    */
  def utcDay(df: DataFrame, tsCol: String = "ts"): Column =
    to_date(timestamp_millis(epochMs(df, tsCol)))
}
