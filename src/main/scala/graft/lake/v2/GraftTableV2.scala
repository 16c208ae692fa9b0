package graft.lake.v2

import graft.lake.{DefaultSource, LakeTable, TransactionLog}
import graft.lake.TransactionLog.Snapshot
import org.apache.spark.sql.{Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.file.Path
import scala.jdk.CollectionConverters._

/** The lake table as a DataSource V2 `Table` — the catalog surface
  * that lets the reference's GENERATED SQL statements run verbatim:
  * `CREATE TABLE … (PRIMARY KEY …)`, `INSERT INTO … SELECT CAST(…)`,
  * and (through the GraftDmlRule extension) `MERGE INTO` / `UPDATE` /
  * `DELETE` (/root/reference/src/component.py:216-258).
  *
  * Reads: a pruning+pushdown `ScanBuilder` served through `V1Scan` —
  * the required columns and pushable predicates reach the SAME
  * log-backed `LakeTable.read` plan as `format("graft")`, so parquet
  * pushdown, stats skipping and partition pruning all apply inside the
  * scan. Writes: `V1Write` onto the mode-dispatched `LakeTable.write`
  * (append / INSERT OVERWRITE-truncate), one atomic commit.
  *
  * `format("graft")` itself stays a V1 relation on purpose: V2 scans
  * cannot express `HadoopFsRelation`'s `BucketSpec`, so flipping the
  * path API to V2 would regress the bucketed zero-exchange joins
  * (BucketingSpec) — the same split Delta Lake ships (catalog DSv2 +
  * V1 execution relations).
  */
final class GraftTableV2(spark: SparkSession, val tablePath: Path, ident: String,
    asOfVersion: Long = -1L)
    extends Table with SupportsRead with SupportsWrite {

  private[v2] lazy val lake = new LakeTable(spark, tablePath)
  private lazy val snap: Snapshot = TransactionLog.snapshot(tablePath, asOfVersion)

  override def name(): String = ident

  override def schema(): StructType = snap.schema

  override def partitioning(): Array[Transform] =
    snap.metadata.partitionColumns.map(Expressions.identity).toArray

  override def properties(): java.util.Map[String, String] =
    snap.metadata.configuration.asJava

  /** `AUTOMATIC_SCHEMA_EVOLUTION` opts into Spark's own
    * `ResolveMergeIntoSchemaEvolution`: `MERGE WITH SCHEMA EVOLUTION`
    * computes the new-column `TableChange`s at analysis time and routes
    * them through `GraftCatalog.alterTable` (→ `LakeTable
    * .alterAddColumn`, a metadata-only commit) before clause
    * resolution — the same write-path evolution `schema_mode="merge"`
    * gives every reference write (component.py:97,109), now symmetric
    * on the SQL MERGE path. Like Delta, the widening commits even if
    * the merge itself later fails (analysis-time DDL).
    */
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(lake, snap.schema, asOfVersion)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (asOfVersion >= 0L)
      throw graft.core.UserException(
        s"Cannot write to table $ident at historical version $asOfVersion " +
          "(time-travel reads are read-only)")
    new GraftWriteBuilder(lake, snap.metadata.partitionColumns)
  }
}

/** Column pruning + filter pushdown for the catalog read path. We
  * claim NO filter as fully handled (pushFilters returns every filter
  * as post-scan), so Spark re-applies them above — exactness is free;
  * the pushed set still reaches the parquet scan through
  * `LakeTable.read().where(…)` for row-group skipping and the file
  * index's min/max pruning.
  */
final class GraftScanBuilder(lake: LakeTable, fullSchema: StructType,
    asOfVersion: Long = -1L)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => DefaultSource.filterToColumn(f).isDefined)
    filters // all re-applied by Spark: exact semantics regardless of pushdown
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val requiredNow = required
      val pushedNow = pushed
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = requiredNow
        override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
          val base = pushedNow.flatMap(DefaultSource.filterToColumn)
            .foldLeft(lake.read(versionAsOf = asOfVersion))(_ where _)
          // empty requiredNow (COUNT(*)-style) ⇒ zero-field rows
          base.select(requiredNow.fieldNames.toSeq.map(DefaultSource.quotedCol): _*).rdd
        }
      }.asInstanceOf[T]
    }
  }
}

/** INSERT INTO (append) and INSERT OVERWRITE / truncate onto the
  * lake's mode dispatch. Spark has already aligned the query to the
  * table schema by position+cast (no ACCEPT_ANY_SCHEMA: SQL INSERT
  * must not silently evolve the schema), so the write lands with
  * `mergeSchema = false`.
  */
final class GraftWriteBuilder(lake: LakeTable, partCols: Seq[String])
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    if (!filters.forall(_.isInstanceOf[AlwaysTrue]))
      throw graft.core.UserException(
        "graft supports only full-table INSERT OVERWRITE " +
          s"(got filters ${filters.mkString(",")})")
    truncate()
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame, overwrite: Boolean): Unit = {
          val ow = overwriteAll || overwrite
          lake.write(data,
            mode = if (ow) "overwrite" else "append",
            partitionBy = partCols,
            mergeSchema = false,
            // SQL INSERT OVERWRITE must keep the DDL-declared layout
            // (the API's overwrite may change/drop bucketing; a
            // CLUSTERED BY table's layout is table state, not a
            // per-write choice)
            bucketBy = if (ow) lake.bucketing else None)
        }
      }
  }
}
