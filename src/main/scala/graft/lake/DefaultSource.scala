package graft.lake

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** DataSource registration: the lake as a first-class Spark source.
  *
  *   spark.read.format("graft").load(path)                   // read
  *   df.write.format("graft").mode("append").save(path)      // write
  *   stream.writeStream.format("graft")...start(path)        // sink
  *   CREATE TEMPORARY VIEW t USING graft OPTIONS (path '…')  // SQL
  *
  * Reads go through the same log-backed FileIndex (partition pruning +
  * stats skipping) as `LakeTable.read`. Writes map SaveMode onto the
  * lake's mode dispatch; `partitionBy` arrives as an option
  * (comma-separated) because V1 relation providers don't receive the
  * writer's partitioning. The streaming sink reuses the idempotent
  * batch-id protocol of graft.streaming.
  *
  * Options: `path` (required), `versionAsOf`/`timestampAsOf` (read), `partitionBy`,
  * `mergeSchema`, `compression` (write).
  */
class DefaultSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw graft.core.UserException("graft.lake source requires a 'path' option"))
    val lakeMode = mode match {
      case SaveMode.Append        => "append"
      case SaveMode.Overwrite     => "overwrite"
      case SaveMode.ErrorIfExists => "error"
      case SaveMode.Ignore        => "ignore"
    }
    val table = new LakeTable(sqlContext.sparkSession, TransactionLog.pathOf(path))
    if (!(lakeMode == "ignore" && table.exists)) {
      table.write(data,
        mode = if (lakeMode == "ignore") "error" else lakeMode,
        partitionBy = parameters.get("partitionBy")
          .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil),
        mergeSchema = parameters.get("mergeSchema").forall(_.toBoolean),
        compression = parameters.getOrElse("compression", "snappy"),
        bucketBy = parameters.get("bucketBy").map { cols =>
          Bucketing(
            parameters.getOrElse("numBuckets",
              throw graft.core.UserException(
                "bucketBy requires a 'numBuckets' option")).toInt,
            cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty),
            parameters.get("sortBy")
              .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
              .getOrElse(Nil))
        })
    }
    createRelation(sqlContext, Map("path" -> path))
  }

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw graft.core.UserException("graft.lake sink requires a 'path' option"))
    val table = TransactionLog.pathOf(path)
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // `data` is streaming-flagged (df.write is rejected); rebuild a
        // batch frame over the micro-batch's executed RDD — rows stay
        // distributed, no driver materialization — then reuse the
        // idempotent append (same commit protocol + batch-id dedup as
        // graft.streaming's foreachBatch sink).
        val schema = data.schema
        val converter = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(schema)
        val rowRdd = data.queryExecution.toRdd.map(ir =>
          converter(ir.copy()).asInstanceOf[org.apache.spark.sql.Row])
        val batchDf = data.sparkSession.createDataFrame(rowRdd, schema)
        graft.streaming.EventStreams.appendBatchIdempotent(batchDf, table, batchId)
      }
      override def toString: String = s"GraftLakeSink[$path]"
    }
  }

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw graft.core.UserException("graft.lake source requires a 'path' option"))
    val table = TransactionLog.pathOf(path)
    if (parameters.contains("versionAsOf") && parameters.contains("timestampAsOf"))
      throw graft.core.UserException(
        "Specify either versionAsOf or timestampAsOf, not both")
    def asLong(key: String): Long = {
      val v = parameters(key)
      try v.toLong catch {
        case _: NumberFormatException => throw graft.core.UserException(
          s"$key must be a number ($key=$v; timestampAsOf takes epoch millis)")
      }
    }
    val version = parameters.get("versionAsOf").map(_ => asLong("versionAsOf"))
      .orElse(parameters.get("timestampAsOf").map(_ =>
        new LakeTable(spark, table).versionAsOfTimestamp(asLong("timestampAsOf"))))
      .getOrElse(-1L)
    val snap = TransactionLog.snapshot(table, version)
    val renamed = snap.metadata.configuration.keys
      .exists(_.startsWith("graft.mapping."))
    if (renamed) {
      // Column-mapped tables need the logical→physical projection that
      // a bare BaseRelation cannot express; serve the LakeTable read
      // (still log-pruned and stats-skipped inside) through a TableScan.
      val ctx = sqlContext
      val df = new LakeTable(spark, table).read(version)
      new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = df.rdd
      }
    } else {
      // no column mapping ⇒ physical == logical; serve the shared
      // relation (same index, bucket spec, stats skipping as
      // LakeTable.read)
      new LakeTable(spark, table).fsRelation(snap)
    }
  }
}
