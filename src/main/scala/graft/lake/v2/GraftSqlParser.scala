package graft.lake.v2

import graft.core.UserException
import graft.lake.LakeTable
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.Row

/** Lake maintenance SQL — the statements Delta Lake adds to Spark's
  * grammar, over graft tables:
  *
  *   OPTIMIZE <table> [ZORDER BY (c1, c2, …)]
  *   VACUUM <table> [RETAIN <n> HOURS]
  *   DESCRIBE HISTORY <table>
  *   DESCRIBE DETAIL <table>   (table status incl. DV maintenance flag)
  *   RESTORE TABLE <table> TO VERSION AS OF <n>
  *   COPY INTO <table> FROM '<dir>' [WITH (CREDENTIAL (…))]
  *     FILEFORMAT = CSV [FILES = (…)] [FORMAT_OPTIONS (…)]
  *
  * `COPY INTO` is the last of the reference's five generated statement
  * shapes (/root/reference/src/component.py:150-172): stage loads run
  * as the literal emitted text, routed onto the same all-STRING CSV
  * scan + atomic append the API path uses.
  *
  * Injected via `SparkSessionExtensions.injectParser`; anything not
  * matching these shapes falls through to the delegate parser
  * untouched — including statements whose table identifier does NOT
  * address a registered [[GraftCatalog]] (a Delta table coexisting in
  * the session keeps its own OPTIMIZE/VACUUM). Table identifiers
  * resolve through the registered GraftCatalog (including the
  * ``graft.`/abs/path` `` convention), with the multipart text parsed
  * by the DELEGATE parser so quoting rules stay exactly Spark's.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // an identifier: dotted bare segments and/or backquoted segments
  // (covers graft.default.t and graft.`/abs/path`)
  private val Ident = """((?:`[^`]+`|[\w$]+)(?:\s*\.\s*(?:`[^`]+`|[\w$]+))*)"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Ident +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val VacuumRe = ("""(?is)^\s*VACUUM\s+""" + Ident +
    """(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?)?\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Ident + """\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Ident + """\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  // the reference's exact stage-load shape (component.py:157-172):
  //   COPY INTO stg FROM '<dir>/' WITH (CREDENTIAL (K = 'v', …))
  //   FILEFORMAT = CSV FILES = ('a.csv', …) FORMAT_OPTIONS ('k' = 'v', …)
  private val CopyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+""" + Ident +
      """\s+FROM\s+'([^']*)'""" +
      """(?:\s+WITH\s*\(\s*CREDENTIAL\s*\(([^)]*)\)\s*\))?""" +
      """\s+FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+FILES\s*=\s*\(([^)]*)\))?""" +
      """(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val KvRe = """(\w+)\s*=\s*'([^']*)'""".r
  private val QuotedRe = """'([^']*)'""".r
  private val OptRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  /** Does this multipart name address a table in a [[GraftCatalog]]?
    * Maintenance statements are only claimed when it does — a Delta (or
    * any other) catalog coexisting in the session keeps its own
    * OPTIMIZE/VACUUM grammar via the delegate parser. Resolution
    * mirrors [[GraftIdentifiers.resolveLake]]; any resolution failure
    * means "not ours".
    */
  private def addressesGraft(nameParts: Seq[String]): Boolean =
    try {
      val mgr = org.apache.spark.sql.SparkSession.active
        .asInstanceOf[SparkSession].sessionState.catalogManager
      val catName = nameParts match {
        case head +: tail if tail.nonEmpty && mgr.isCatalogRegistered(head) => head
        case _ => mgr.currentCatalog.name
      }
      mgr.catalog(catName).isInstanceOf[GraftCatalog]
    } catch { case scala.util.control.NonFatal(_) => false }

  private[v2] def maintenancePlan(
      sqlText: String, parser: ParserInterface): Option[LogicalPlan] = {
    def claim(ident: String)(mk: Seq[String] => LogicalPlan): Option[LogicalPlan] = {
      val parts = parser.parseMultipartIdentifier(ident)
      if (addressesGraft(parts)) Some(mk(parts)) else None
    }
    sqlText match {
      case OptimizeRe(ident, zcols) =>
        val cols = Option(zcols).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        claim(ident)(GraftMaintenanceCommand("optimize", _, cols, -1L))
      case VacuumRe(ident, retain) =>
        claim(ident)(GraftMaintenanceCommand("vacuum", _, Nil, -1L,
          retainHours = Option(retain).map(_.toDouble).getOrElse(0.0)))
      case HistoryRe(ident) =>
        claim(ident)(GraftMaintenanceCommand("history", _, Nil, -1L))
      case DetailRe(ident) =>
        claim(ident)(GraftMaintenanceCommand("detail", _, Nil, -1L))
      case RestoreRe(ident, v) =>
        claim(ident)(GraftMaintenanceCommand("restore", _, Nil, v.toLong))
      case CopyIntoRe(ident, fromDir, cred, format, files, fmtOpts) =>
        claim(ident)(GraftCopyIntoCommand(_, fromDir,
          credential = Option(cred).toSeq.flatMap(KvRe.findAllMatchIn(_).map(m =>
            m.group(1).toUpperCase -> m.group(2))).toMap,
          fileFormat = format.toUpperCase,
          files = Option(files).toSeq.flatMap(QuotedRe.findAllMatchIn(_).map(_.group(1))),
          formatOptions = Option(fmtOpts).toSeq.flatMap(OptRe.findAllMatchIn(_).map(m =>
            m.group(1) -> m.group(2))).toMap))
      case _ => None
    }
  }
}

/** Multipart-identifier → LakeTable resolution through whichever
  * GraftCatalog the name addresses (shared by maintenance SQL and the
  * graft_table_changes table function).
  */
object GraftIdentifiers {
  def resolveLake(
      spark: org.apache.spark.sql.SparkSession,
      nameParts: Seq[String],
      context: String): LakeTable = {
    val mgr = spark.asInstanceOf[SparkSession].sessionState.catalogManager
    val (catName, rest) = nameParts match {
      case head +: tail if tail.nonEmpty && mgr.isCatalogRegistered(head) => (head, tail)
      case _ => (mgr.currentCatalog.name, nameParts)
    }
    mgr.catalog(catName) match {
      case g: GraftCatalog =>
        val ident = Identifier.of(rest.dropRight(1).toArray, rest.last)
        new LakeTable(spark, g.tableDir(ident))
      case other => throw UserException(
        s"$context requires a graft catalog table; " +
          s"'$catName' is ${other.getClass.getSimpleName}")
    }
  }
}

/** `graft_table_changes('<table>', since[, to])` — the SQL surface of
  * `LakeTable.changes`: rows appended in the commit-version range
  * (since, to], each stamped `_commit_version`. Registered as a TABLE
  * function (`SELECT … FROM graft_table_changes(…)`), the
  * Delta-CDF-style incremental read for pure-SQL consumers.
  */
object GraftTableChanges {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{IntegerType, LongType => SqlLongType, StringType => SqlStringType}

  private def foldableString(e: Expression): String = e match {
    case x if x.foldable && x.dataType == SqlStringType =>
      Option(x.eval()).map(_.toString).getOrElse(
        throw UserException("graft_table_changes: table name must not be NULL"))
    case other => throw UserException(
      s"graft_table_changes: table name must be a string literal, got $other")
  }
  private def foldableLong(e: Expression): Long = e match {
    case x if x.foldable && (x.dataType == SqlLongType || x.dataType == IntegerType) =>
      Option(Literal.create(x.eval(), x.dataType).value)
        .map(_.asInstanceOf[Number].longValue()).getOrElse(
          throw UserException("graft_table_changes: version must not be NULL"))
    case other => throw UserException(
      s"graft_table_changes: version must be an integer literal, got $other")
  }

  private[graft] val builder: Seq[Expression] => LogicalPlan = exprs => {
    if (exprs.length < 2 || exprs.length > 3)
      throw UserException(
        s"graft_table_changes(table, since[, to]) takes 2 or 3 arguments, got ${exprs.length}")
    val spark = org.apache.spark.sql.SparkSession.active
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(foldableString(exprs.head))
    val lake = GraftIdentifiers.resolveLake(spark, parts, "graft_table_changes")
    val since = foldableLong(exprs(1))
    val to = if (exprs.length == 3) foldableLong(exprs(2)) else -1L
    lake.changes(sinceVersion = since, toVersion = to).queryExecution.logical
  }
}

/** Eagerly-executed maintenance command over a graft catalog table.
  * `retainHours` (VACUUM only): files unreferenced by the CURRENT
  * snapshot are kept if younger than the window — Delta's guard for
  * in-flight readers of just-removed files; 0 deletes immediately.
  */
case class GraftMaintenanceCommand(
    kind: String,
    nameParts: Seq[String],
    zorderBy: Seq[String],
    version: Long,
    retainHours: Double = 0.0) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = kind match {
    case "optimize" => Seq(AttributeReference("files_rewritten", LongType)())
    case "vacuum" => Seq(AttributeReference("files_deleted", LongType)())
    case "history" => Seq(
      AttributeReference("version", LongType)(),
      AttributeReference("timestamp", TimestampType)(),
      AttributeReference("operation", StringType)(),
      AttributeReference("operation_parameters", StringType)())
    case "restore" => Seq(AttributeReference("restored_to_version", LongType)())
    case "detail" => Seq(
      AttributeReference("version", LongType)(),
      AttributeReference("num_files", LongType)(),
      AttributeReference("size_bytes", LongType)(),
      AttributeReference("dv_files", LongType)(),
      AttributeReference("dv_bytes", LongType)(),
      AttributeReference("deleted_rows", LongType)(),
      AttributeReference("dv_files_over_threshold", LongType)(),
      AttributeReference("dv_optimize_recommended",
        org.apache.spark.sql.types.BooleanType)(),
      AttributeReference("properties", StringType)())
  }

  override def run(spark: org.apache.spark.sql.SparkSession): Seq[Row] = {
    val lake = GraftIdentifiers.resolveLake(spark, nameParts, kind.toUpperCase)
    if (!lake.exists) throw UserException(
      s"Table ${nameParts.mkString(".")} does not exist")
    kind match {
      case "optimize" =>
        val n = if (zorderBy.nonEmpty) lake.compactZOrder(zorderBy)
        else lake.compact(minFilesPerPartition = 2)
        Seq(Row(n.toLong))
      case "vacuum" =>
        Seq(Row(lake.vacuum((retainHours * 3600 * 1000).toLong).toLong))
      case "history" => lake.historyInfo.map(ci => Row(
        ci.version,
        new java.sql.Timestamp(ci.timestamp),
        ci.operation,
        ci.operationParameters.toSeq.sorted.map { case (k, v) => s"$k=$v" }
          .mkString(", ")))
      case "restore" =>
        lake.restore(version)
        Seq(Row(version))
      case "detail" =>
        // the status surface a graft.dv.autoOptimize=false pipeline
        // polls instead of scraping stderr: dv_optimize_recommended is
        // true whenever a policy pass was deferred (or never ran) and
        // files sit over the materialization threshold
        val snap = lake.snapshotNow
        val (dvFiles, dvBytes, deletedRows, overThreshold) = lake.dvStatusNow
        Seq(Row(
          snap.version,
          snap.files.size.toLong,
          snap.files.map(_.size).sum,
          dvFiles.toLong,
          dvBytes,
          deletedRows,
          overThreshold.toLong,
          overThreshold > 0,
          snap.metadata.configuration.toSeq.sorted
            .map { case (k, v) => s"$k=$v" }.mkString(", ")))
    }
  }
}

/** `COPY INTO` — the reference's generated stage-load statement
  * (/root/reference/src/component.py:157-172) executed verbatim: the
  * listed CSV slices are scanned with the TARGET table's schema (the
  * all-STRING `_c0.._cN` stage, so no inference — the statement itself
  * pins `'inferSchema' = 'false'`) and appended in one atomic commit.
  * Multi-file CSV parallelizes across files/splits; the row counts
  * come from the commit's per-file stats, never a second scan.
  *
  * The `WITH (CREDENTIAL (…))` clause carries the reference's S3
  * staging credentials; they translate onto the scoped s3a Hadoop keys
  * (the same S4 mapping as `graft.runner.StorageCredentials`) and are
  * a no-op for local paths.
  */
case class GraftCopyIntoCommand(
    nameParts: Seq[String],
    fromDir: String,
    credential: Map[String, String],
    fileFormat: String,
    files: Seq[String],
    formatOptions: Map[String, String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_affected_rows", LongType)(),
    AttributeReference("num_inserted_rows", LongType)())

  override def run(spark: org.apache.spark.sql.SparkSession): Seq[Row] = {
    val lake = GraftIdentifiers.resolveLake(spark, nameParts, "COPY INTO")
    if (!lake.exists) throw UserException(
      s"COPY INTO target ${nameParts.mkString(".")} does not exist; " +
        "create the table first (the reference creates the stage with " +
        "CREATE OR REPLACE TABLE)")
    if (fileFormat != "CSV") throw UserException(
      s"COPY INTO supports FILEFORMAT = CSV, got $fileFormat")
    Seq("inferSchema", "mergeSchema").foreach { opt =>
      if (formatOptions.getOrElse(opt, "false").equalsIgnoreCase("true"))
        throw UserException(
          s"COPY INTO: '$opt' = 'true' is not supported — the target " +
            "table's schema is authoritative")
    }

    // reference credentials (AWS_ACCESS_KEY/…) → s3a conf, the same
    // translation StorageCredentials.hadoopConf performs for the API
    // path; pointless-but-harmless for local paths
    val hc = spark.sparkContext.hadoopConfiguration
    credential.get("AWS_ACCESS_KEY").foreach(hc.set("fs.s3a.access.key", _))
    credential.get("AWS_SECRET_KEY").foreach(hc.set("fs.s3a.secret.key", _))
    credential.get("AWS_SESSION_TOKEN").foreach { t =>
      hc.set("fs.s3a.session.token", t)
      hc.set("fs.s3a.aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    }

    val dir = if (fromDir.endsWith("/")) fromDir else fromDir + "/"
    val paths = if (files.nonEmpty) files.map(dir + _) else Seq(dir)
    val stageSchema = lake.read().schema
    val reader = spark.read
      .schema(stageSchema)
      .option("header", formatOptions.getOrElse("header", "false"))
      .option("mode", "PERMISSIVE")
    val df = reader.csv(paths: _*)

    // inserted-row count from the commit's per-file stats (metadata
    // subtraction, no second scan of the CSV)
    def logged(): Long =
      graft.lake.TransactionLog.snapshot(lake.path)
        .files.flatMap(_.numRecords).sum
    val before = logged()
    lake.write(df, mode = "append", mergeSchema = false)
    val n = logged() - before
    Seq(Row(n, n))
  }
}
