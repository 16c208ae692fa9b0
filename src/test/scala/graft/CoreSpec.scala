package graft

import graft.core._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class CoreSpec extends AnyFunSuite {

  test("base type mapping covers the Keboola surface") {
    assert(BaseTypes.toSpark("STRING") == StringType)
    assert(BaseTypes.toSpark("integer") == LongType)
    assert(BaseTypes.toSpark("NUMERIC") == DecimalType(38, 9))
    assert(BaseTypes.toSpark("FLOAT") == DoubleType)
    assert(BaseTypes.toSpark("BOOLEAN") == BooleanType)
    assert(BaseTypes.toSpark("DATE") == DateType)
    assert(BaseTypes.toSpark("TIMESTAMP") == TimestampType)
    val e = intercept[UserException](BaseTypes.toSpark("BLOB"))
    assert(e.getMessage.contains("Unsupported base type"))
  }

  test("config validation flattens errors in the reference shape") {
    val bad = Config(batchSize = -1, threads = 0)
    val e = intercept[UserException](Config.validated(bad))
    assert(e.getMessage.startsWith("Validation Error: "))
    assert(e.getMessage.contains("batch_size: must be positive"))
    assert(e.getMessage.contains("threads: must be positive"))
  }

  test("external mode gate rejects upsert; native requires warehouse") {
    val c = Config(destination = Destination(mode = LoadType.Upsert))
    assert(intercept[UserException](c.validateExternalMode())
      .getMessage.contains("Unsupported mode for external table"))
    val n = Config(destination = Destination(mode = LoadType.Append, warehouse = ""))
    assert(intercept[UserException](n.validateNativeMode())
      .getMessage.contains("Warehouse must be specified"))
    Config(destination = Destination(mode = LoadType.Upsert, warehouse = "wh",
      tableType = TableType.Native)).validateNativeMode()
  }

  test("manifest parsing: columns, pk, base types, staging schema") {
    val dir = Files.createTempDirectory("graft-manifest")
    val manifest = dir.resolve("t1.csv.manifest")
    Files.writeString(manifest,
      """{"name":"t1","columns":["id","amount","note"],"primary_key":["id"],
        |"column_metadata":{
        |  "id":[{"key":"KBC.datatype.basetype","value":"INTEGER"}],
        |  "amount":[{"key":"KBC.datatype.basetype","value":"FLOAT"}],
        |  "note":[]}}""".stripMargin)
    val td = TableDef.fromManifest(manifest)
    assert(td.name == "t1")
    assert(td.primaryKey == Seq("id"))
    assert(td.sparkSchema == StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("note", StringType))))
    assert(td.stagingSchema.fieldNames.toSeq == Seq("_c0", "_c1", "_c2"))
  }

  test("reference sample manifest parses (all STRING, no pk)") {
    val p = Paths.get(
      "/root/reference/component_config/sample-config/in/tables/test.csv.manifest")
    assume(Files.exists(p))
    val td = TableDef.fromManifest(p)
    assert(td.columns.size == 7)
    assert(td.primaryKey.isEmpty)
    assert(td.sparkSchema.fields.forall(_.dataType == StringType))
  }

  test("input shape validation (M1)") {
    val t = TableDef("t", Seq("a"), Map.empty, Nil)
    TableDef.validateInputShape(Seq(t), Nil)
    TableDef.validateInputShape(Nil, Seq("f.parquet"))
    assert(intercept[UserException](TableDef.validateInputShape(Nil, Nil))
      .getMessage.contains("Either one input table or input files"))
    assert(intercept[UserException](
      TableDef.validateInputShape(Seq(t), Seq("f"))).getMessage.contains("Only one of"))
    assert(intercept[UserException](
      TableDef.validateInputShape(Seq(t, t), Nil)).getMessage.contains("Only one input table"))
  }
}
