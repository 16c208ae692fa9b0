package graft.core

import org.apache.spark.sql.types._

/** Keboola base-type → Spark `DataType` mapping.
  *
  * The reference consumes manifest base types verbatim as engine dtypes
  * (/root/reference/src/component.py:72-77 for the DuckDB scan,
  * :196-204 for generated CAST SQL). The public Keboola storage base
  * types are STRING, INTEGER, NUMERIC, FLOAT, BOOLEAN, DATE, TIMESTAMP.
  *
  * Choices documented in SURVEY.md §1.4: INTEGER → LongType (safe
  * superset), NUMERIC → DecimalType(38, 9) by default (configurable —
  * the warehouse default DECIMAL(10,0) loses fractional digits, which
  * is never what an ETL ingest wants).
  */
object BaseTypes {
  val NumericDefault: DecimalType = DecimalType(38, 9)

  def toSpark(baseType: String, numeric: DecimalType = NumericDefault): DataType =
    baseType.trim.toUpperCase match {
      case "STRING"    => StringType
      case "INTEGER"   => LongType
      case "NUMERIC"   => numeric
      case "FLOAT"     => DoubleType
      case "BOOLEAN"   => BooleanType
      case "DATE"      => DateType
      case "TIMESTAMP" => TimestampType
      case other =>
        throw UserException(s"Unsupported base type: $other")
    }

  /** Inverse mapping used when exporting a Spark schema as manifest
    * base types (sync action C5 / list_table_columns parity).
    */
  def fromSpark(dt: DataType): String = dt match {
    case StringType                            => "STRING"
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case _: DecimalType                        => "NUMERIC"
    case FloatType | DoubleType                => "FLOAT"
    case BooleanType                           => "BOOLEAN"
    case DateType                              => "DATE"
    case TimestampType                         => "TIMESTAMP"
    case _                                     => "STRING" // degrade like the reference's staging path
  }
}
