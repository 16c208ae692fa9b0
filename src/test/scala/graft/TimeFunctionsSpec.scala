package graft

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TimeFunctions must yield the SAME epoch-ms/day projections for
  * every physical encoding `events.ts` has shipped under: raw-nanos
  * BIGINT (parquet TIMESTAMP(NANOS) via nanosAsLong), TIMESTAMP_NTZ
  * (parquet TIMESTAMP(MICROS) without UTC adjustment), and a plain
  * zoned TIMESTAMP. The shipped testdata only ever exercises one
  * encoding per generation, so this spec is the coverage for the
  * other branches.
  */
class TimeFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 2024-01-01T00:00:01.5Z plus a value after the DST-ish boundary and
  // one with sub-ms precision (truncation toward past must agree)
  private val instantsMs = Seq(1704067201500L, 1704153600000L, 1704067201999L)

  private def frame(dt: DataType): org.apache.spark.sql.DataFrame = {
    val rows = instantsMs.map { ms =>
      val v: Any = dt match {
        case LongType => ms * 1000000L // raw nanos
        case TimestampNTZType =>
          LocalDateTime.ofEpochSecond(ms / 1000, (ms % 1000).toInt * 1000000, ZoneOffset.UTC)
        case TimestampType => Instant.ofEpochMilli(ms)
        case other => fail(s"unhandled $other")
      }
      Row(v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("ts", dt))))
  }

  test("epochMs agrees across raw-nanos, NTZ, and zoned encodings") {
    val expected = instantsMs
    Seq[DataType](LongType, TimestampNTZType, TimestampType).foreach { dt =>
      val df = frame(dt)
      val got = df.select(graft.functions.TimeFunctions.epochMs(df))
        .collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"encoding $dt")
    }
  }

  test("utcDay agrees across encodings and is a UTC calendar day") {
    Seq[DataType](LongType, TimestampNTZType, TimestampType).foreach { dt =>
      val df = frame(dt)
      val got = df.select(graft.functions.TimeFunctions.utcDay(df))
        .collect().map(_.get(0).toString).toSeq
      assert(got == Seq("2024-01-01", "2024-01-02", "2024-01-01"), s"encoding $dt")
    }
  }
}
