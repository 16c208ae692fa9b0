package graft.runner

import graft.core._
import graft.lake.LakeTable
import graft.operators.StageCast
import graft.sources.StagedCsv
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Entry points A and B of the reference component (SURVEY.md §3.1-3.2),
  * re-expressed over the graft lake:
  *
  *   run() → validate input shape + mode → read (CSV stage | parquet)
  *        → cast projection → mode-dispatched lake write / merge.
  *
  * The external (direct write) and native (generated SQL) paths of the
  * reference collapse onto the same in-engine pipeline; what survives
  * of the distinction is the mode gate (M2 vs M3,
  * /root/reference/src/component.py:64-68, 178-185) and the staging
  * semantics (all-STRING stage then cast, :135-145, 196-204) — which we
  * run through for BOTH paths so cast behavior is uniform.
  */
object Runner {

  /** Loads the single input as a typed DataFrame: staged CSV + cast for
    * table inputs, self-describing parquet for file inputs.
    */
  def loadInput(
      spark: SparkSession,
      dataDir: Path,
      csvHasHeader: Boolean = true,
      keepStage: Boolean = false): DataFrame = {
    val tables = TableDef.fromDataDir(dataDir)
    val files = parquetInputs(dataDir)
    TableDef.validateInputShape(tables, files)
    if (tables.nonEmpty) {
      val t = tables.head
      if (t.dataPaths.isEmpty)
        throw UserException(s"Input table ${t.name} has no data file")
      // sliced chunks are headerless regardless of the caller's flag
      val staged = StagedCsv.read(spark, t, t.dataPaths,
        hasHeader = csvHasHeader && !t.sliced)
      // keep_stage: the all-string staged frame survives the run as a
      // temp view for post-run inspection (the reference keeps its
      // DuckDB staging table); default false drops it — D3 semantics.
      val viewName = s"graft_stage_${t.name}"
      if (keepStage) staged.createOrReplaceTempView(viewName)
      else spark.catalog.dropTempView(viewName)
      StageCast.fromStaging(staged, t)
    } else {
      StagedCsv.readParquet(spark, files)
    }
  }

  /** File inputs: parquet files under in/files
    * (/root/reference/src/component.py:38-39 — "one or more files with
    * the same schema"; non-parquet files are ignored like the
    * reference's delegation to DuckDB read_parquet would fail them).
    */
  def parquetInputs(dataDir: Path): Seq[String] = {
    val dir = dataDir.resolve("in/files")
    if (!Files.isDirectory(dir)) Nil
    else TableDef.listDir(dir)
      .filter(_.toString.endsWith(".parquet")).map(_.toString).sorted
  }

  /** External-table path (entry point A): direct lake write. */
  def runExternal(spark: SparkSession, config: Config, dataDir: Path, dest: Path): Unit = {
    config.validateExternalMode()
    val d = config.destination
    val loaded = loadInput(spark, dataDir, keepStage = config.keepStage)
    val df = if (d.dedupColumns.nonEmpty)
      graft.operators.Dedup.exact(loaded, d.dedupColumns) else loaded
    new LakeTable(spark, dest).write(
      df,
      mode = d.mode.toString,
      partitionBy = d.partitionBy,
      mergeSchema = true, // schema_mode="merge" on every reference write
      compression = Config.sparkCompression(d.compression),
      bucketBy = destBucketing(d))
  }

  private def destBucketing(d: graft.core.Destination): Option[graft.lake.Bucketing] =
    if (d.bucketBy.isEmpty) None
    else Some(graft.lake.Bucketing(d.numBuckets, d.bucketBy, d.bucketSortBy))

  /** Native-table path (entry point B): stage → cast → write/MERGE.
    * The stage is implicit (the cast projection); upsert requires
    * manifest PKs (component.py:241-242).
    */
  def runNative(spark: SparkSession, config: Config, dataDir: Path, dest: Path): Unit = {
    config.validateNativeMode()
    val tables = TableDef.fromDataDir(dataDir)
    if (tables.isEmpty)
      throw UserException("Native table type requires a table input.")
    val df = loadInput(spark, dataDir, keepStage = config.keepStage)
    val d = config.destination
    val lake = new LakeTable(spark, dest)
    d.mode match {
      case LoadType.Upsert =>
        val t = tables.head
        t.requirePrimaryKey()
        if (!lake.exists) // bootstrap schema+partitioning, then merge
          lake.write(df.limit(0), "append", d.partitionBy,
            mergeSchema = true, Config.sparkCompression(d.compression),
            bucketBy = destBucketing(d))
        lake.merge(df, t.primaryKey)
      case m =>
        lake.write(df, m.toString, d.partitionBy,
          mergeSchema = true, Config.sparkCompression(d.compression),
          bucketBy = destBucketing(d))
    }
  }

  /** Table-type dispatch (M4, component.py:53-61). */
  def run(spark: SparkSession, config: Config, dataDir: Path, dest: Path): Unit =
    config.destination.tableType match {
      case TableType.External => runExternal(spark, config, dataDir, dest)
      case TableType.Native   => runNative(spark, config, dataDir, dest)
    }
}
