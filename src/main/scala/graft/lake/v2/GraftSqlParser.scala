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
  *   VACUUM <table>
  *   DESCRIBE HISTORY <table>
  *   RESTORE TABLE <table> TO VERSION AS OF <n>
  *
  * Injected via `SparkSessionExtensions.injectParser`; anything not
  * matching these shapes falls through to the delegate parser
  * untouched. Table identifiers resolve through the registered
  * GraftCatalog (including the ``graft.`/abs/path` `` convention),
  * with the multipart text parsed by the DELEGATE parser so quoting
  * rules stay exactly Spark's.
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
  private val VacuumRe = ("""(?is)^\s*VACUUM\s+""" + Ident + """\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Ident + """\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r

  private[v2] def maintenancePlan(
      sqlText: String, parser: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(ident, zcols) =>
        val cols = Option(zcols).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        Some(GraftMaintenanceCommand("optimize",
          parser.parseMultipartIdentifier(ident), cols, -1L))
      case VacuumRe(ident) =>
        Some(GraftMaintenanceCommand("vacuum",
          parser.parseMultipartIdentifier(ident), Nil, -1L))
      case HistoryRe(ident) =>
        Some(GraftMaintenanceCommand("history",
          parser.parseMultipartIdentifier(ident), Nil, -1L))
      case RestoreRe(ident, v) =>
        Some(GraftMaintenanceCommand("restore",
          parser.parseMultipartIdentifier(ident), Nil, v.toLong))
      case _ => None
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

/** Eagerly-executed maintenance command over a graft catalog table. */
case class GraftMaintenanceCommand(
    kind: String,
    nameParts: Seq[String],
    zorderBy: Seq[String],
    version: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = kind match {
    case "optimize" => Seq(AttributeReference("files_rewritten", LongType)())
    case "vacuum" => Seq(AttributeReference("files_deleted", LongType)())
    case "history" => Seq(
      AttributeReference("version", LongType)(),
      AttributeReference("timestamp", TimestampType)(),
      AttributeReference("operation", StringType)(),
      AttributeReference("operation_parameters", StringType)())
    case "restore" => Seq(AttributeReference("restored_to_version", LongType)())
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
      case "vacuum" => Seq(Row(lake.vacuum().toLong))
      case "history" => lake.historyInfo.map(ci => Row(
        ci.version,
        new java.sql.Timestamp(ci.timestamp),
        ci.operation,
        ci.operationParameters.toSeq.sorted.map { case (k, v) => s"$k=$v" }
          .mkString(", ")))
      case "restore" =>
        lake.restore(version)
        Seq(Row(version))
    }
  }
}
