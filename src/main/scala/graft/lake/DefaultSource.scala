package graft.lake

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** DataSource registration: `spark.read.format("graft.lake").load(path)`
  * (or the short name `graft`) opens a lake table as a first-class
  * source — same log-backed FileIndex, partition pruning, and stats
  * skipping as `LakeTable.read`, but reachable from pure-SQL tooling:
  *
  *   CREATE TEMPORARY VIEW t USING graft OPTIONS (path '/data/t');
  *
  * Options: `path` (required), `versionAsOf` (time travel).
  */
class DefaultSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw graft.core.UserException("graft.lake source requires a 'path' option"))
    val version = parameters.get("versionAsOf").map(_.toLong).getOrElse(-1L)
    val table = TransactionLog.pathOf(path)
    val snap = TransactionLog.snapshot(table, version)
    val index = new GraftFileIndex(spark, table, snap)
    val dataSchema = StructType(snap.schema.fields
      .filterNot(f => snap.metadata.partitionColumns.contains(f.name)))
    HadoopFsRelation(index, index.partitionSchema, dataSchema, None,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
  }
}
