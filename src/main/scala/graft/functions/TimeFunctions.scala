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
      case TimestampNTZType   =>
        // NTZ wall clocks are UTC instants by contract, but the
        // TimestampType cast interprets them in the SESSION zone — a
        // session built without SparkEntry.configure would silently
        // zone-shift every epoch while this function still says
        // "utc". Fail loudly at plan time instead.
        requireUtcSession(df)
        unix_millis(col(tsCol).cast(TimestampType))
      case _                  => unix_millis(col(tsCol))
    }

  private def requireUtcSession(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    val isUtc = tz == "UTC" || tz == "Etc/UTC" || tz == "GMT" || tz == "+00:00"
    require(isUtc,
      s"TimeFunctions interprets TIMESTAMP_NTZ wall clocks as UTC instants, " +
        s"but spark.sql.session.timeZone=$tz would zone-shift the cast. " +
        "Build the session through SparkEntry.configure (which pins UTC) " +
        "or set the session time zone to UTC.")
  }

  /** UTC calendar day of `tsCol`, robust the same way (a raw-nanos
    * LongType would silently `to_date` to NULL otherwise).
    */
  def utcDay(df: DataFrame, tsCol: String = "ts"): Column = {
    // to_date renders the instant in the SESSION zone on every branch
    // (not just NTZ) — "utc day" is only true under a UTC session
    requireUtcSession(df)
    to_date(timestamp_millis(epochMs(df, tsCol)))
  }
}
