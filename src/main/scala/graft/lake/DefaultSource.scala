package graft.lake

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
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
object DefaultSource {
  import org.apache.spark.sql.{functions => F, Column}
  import org.apache.spark.sql.sources._

  /** Column by EXACT name: backtick-quoted so logical names containing
    * dots (column mapping allows any string) resolve as one column,
    * not struct access.
    */
  private[graft] def quotedCol(name: String): Column =
    F.col(s"`${name.replace("`", "``")}`")

  /** V1 source Filter → Column, for pushing the outer query's
    * predicates into the column-mapped read. Unsupported shapes return
    * None — safe, because the relation never claims filters handled
    * and Spark re-applies all of them above the scan.
    */
  private[graft] def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(quotedCol(a) === v)
    case EqualNullSafe(a, v)      => Some(quotedCol(a) <=> v)
    case GreaterThan(a, v)        => Some(quotedCol(a) > v)
    case GreaterThanOrEqual(a, v) => Some(quotedCol(a) >= v)
    case LessThan(a, v)           => Some(quotedCol(a) < v)
    case LessThanOrEqual(a, v)    => Some(quotedCol(a) <= v)
    case In(a, vs)                => Some(quotedCol(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(quotedCol(a).isNull)
    case IsNotNull(a)             => Some(quotedCol(a).isNotNull)
    case StringStartsWith(a, v)   => Some(quotedCol(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(quotedCol(a).endsWith(v))
    case StringContains(a, v)     => Some(quotedCol(a).contains(v))
    case And(l, r) =>
      for (cl <- filterToColumn(l); cr <- filterToColumn(r)) yield cl && cr
    case Or(l, r) =>
      for (cl <- filterToColumn(l); cr <- filterToColumn(r)) yield cl || cr
    case Not(c) => filterToColumn(c).map(!_)
    case _      => None
  }
}

class DefaultSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider with DataSourceRegister {

  // streaming SOURCE: tail the transaction log (see GraftStreamSource)
  override def sourceSchema(
      sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[org.apache.spark.sql.types.StructType],
      providerName: String,
      parameters: Map[String, String]): (String, org.apache.spark.sql.types.StructType) =
    graft.streaming.GraftStreamSource.sourceSchema(parameters, schema)

  override def createSource(
      sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String,
      schema: Option[org.apache.spark.sql.types.StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    graft.streaming.GraftStreamSource.createSource(sqlContext, parameters, schema)

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
    // deletion vectors are applied by LakeTable.read's row-level
    // anti-join — a bare HadoopFsRelation would resurrect deleted rows,
    // so DV'd snapshots go through the same PrunedFilteredScan wrapper
    // as column-mapped tables (pushdown survives either way)
    val hasDv = snap.files.exists(_.dv.isDefined)
    if (renamed || hasDv) {
      // Column-mapped tables need the logical→physical projection that
      // a HadoopFsRelation cannot express. Serve them through
      // PrunedFilteredScan: Spark hands us the required columns and
      // pushable filters in LOGICAL names; applying them to the
      // LakeTable read (an alias projection over the physical scan)
      // lets Catalyst push both through the rename into the parquet
      // source — column pruning, pushed filters, and the file index's
      // stats skipping all survive. Filters are re-applied above by
      // Spark (we don't claim them handled), so semantics are exact.
      val ctx = sqlContext
      val lakeRead = () => new LakeTable(spark, table).read(version)
      val fullSchema = lakeRead().schema
      new BaseRelation with org.apache.spark.sql.sources.PrunedFilteredScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = fullSchema
        override def buildScan(
            requiredColumns: Array[String],
            filters: Array[org.apache.spark.sql.sources.Filter])
            : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
          val base = filters.flatMap(DefaultSource.filterToColumn)
            .foldLeft(lakeRead())(_ where _)
          // empty requiredColumns (COUNT(*)-style) => zero-field rows
          base.select(requiredColumns.map(DefaultSource.quotedCol).toSeq: _*).rdd
        }
      }
    } else {
      // no column mapping ⇒ physical == logical; serve the shared
      // relation (same index, bucket spec, stats skipping as
      // LakeTable.read)
      new LakeTable(spark, table).fsRelation(snap)
    }
  }
}
