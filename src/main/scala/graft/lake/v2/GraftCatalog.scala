package graft.lake.v2

import graft.core.UserException
import graft.lake.{LakeTable, TransactionLog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.constraints.{Check, Constraint, PrimaryKey}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** A Spark `TableCatalog` over a directory of graft lake tables —
  * registered with
  *
  *   --conf spark.sql.catalog.graft=graft.lake.v2.GraftCatalog
  *   --conf spark.sql.catalog.graft.warehouse=/data/graft
  *
  * after which the reference's generated statements address tables as
  * `graft.<schema>.<table>` (component.py builds
  * `{catalog}.{schema}.{table}` the same way, :146-149). Identifiers
  * whose name is an absolute path (``graft.`/tmp/t` ``) bypass the
  * warehouse and address that path directly — Delta's ``delta.`…` ``
  * convention.
  *
  * Namespaces are directories; a table is a directory holding a
  * `_delta_log`. The catalog is metadata-thin by design: the lake's
  * transaction log IS the table state (SURVEY §2: the reference's
  * MSCK-style sync is n/a for the same reason), so every catalog call
  * is O(directory listing), never O(data).
  *
  * `SUPPORT_TABLE_CONSTRAINT`: CHECK constraints wire into the lake's
  * native enforced CHECKs; PRIMARY KEY / UNIQUE / FOREIGN KEY are
  * recorded informationally (`graft.constraint.*` table properties) —
  * the reference's `PRIMARY KEY (…)` DDL (component.py:216-224) parses
  * and round-trips.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: Path = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse")).getOrElse(
      spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        .stripPrefix("file:") + "/graft"))
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("default")

  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def isPathIdent(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name.startsWith("/")

  private[v2] def dirFor(ident: Identifier): Path =
    dirForImpl(ident)

  /** The directory a catalog identifier addresses (maintenance SQL). */
  private[v2] def tableDir(ident: Identifier): Path = dirForImpl(ident)

  private def dirForImpl(ident: Identifier): Path =
    if (isPathIdent(ident)) Paths.get(ident.name)
    else ident.namespace.foldLeft(warehouse)(_ resolve _).resolve(ident.name)

  private def fullName(ident: Identifier): String =
    (catalogName +: (ident.namespace :+ ident.name)).mkString(".")

  override def tableExists(ident: Identifier): Boolean =
    TransactionLog.tableExists(dirFor(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTableV2(spark, dirFor(ident), fullName(ident))
  }

  /** SQL time travel: `SELECT … FROM graft.s.t VERSION AS OF n`
    * resolves through this overload (Spark passes the literal as a
    * string).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw UserException(s"VERSION AS OF must be a commit number, got '$version'")
    }
    new GraftTableV2(spark, dirFor(ident), fullName(ident), asOfVersion = v)
  }

  /** `TIMESTAMP AS OF` — Spark hands MICROseconds since epoch; the
    * log's commit timestamps are millis.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val lake = new LakeTable(spark, dirFor(ident))
    val v = lake.versionAsOfTimestamp(timestamp / 1000L)
    new GraftTableV2(spark, dirFor(ident), fullName(ident), asOfVersion = v)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir)) {
      if (namespace.sameElements(defaultNamespace())) return Array.empty
      throw new NoSuchNamespaceException(namespace)
    }
    withListing(dir)(_.filter(p => TransactionLog.tableExists(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    create(ident, schema, partitions, properties, Array.empty)

  override def createTable(ident: Identifier, info: TableInfo): Table =
    create(ident, info.schema(), info.partitions(), info.properties(), info.constraints())

  private def create(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String],
      constraints: Array[Constraint]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // CLUSTERED BY (cols) INTO n BUCKETS arrives as a bucket transform;
    // record it as the table's Bucketing config so every INSERT routes
    // rows into suffix-named bucket files and reads report
    // HashPartitioning (zero-exchange key joins, bucket-pruned MERGE
    // probes) — the SQL spelling of LakeTable.write(bucketBy = …).
    val (bucketTs, otherTs) = partitions.toSeq
      .partition(t => t.name == "bucket" || t.name == "sorted_bucket")
    val bucketing: Option[graft.lake.Bucketing] = bucketTs match {
      case Nil => None
      case Seq(t) if t.name == "bucket" =>
        val num = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value.isInstanceOf[Number] =>
            l.value.asInstanceOf[Number].intValue
        }.getOrElse(throw UserException(
          "CLUSTERED BY requires INTO <n> BUCKETS"))
        Some(graft.lake.Bucketing(num,
          t.references.map(_.fieldNames.mkString(".")).toSeq))
      case _ => throw UserException(
        "graft tables support a single CLUSTERED BY (…) INTO n BUCKETS " +
          "clause (SORTED BY bucketing is not supported)")
    }
    bucketing.foreach { b =>
      val missing = b.columns.filterNot(schema.fieldNames.contains)
      if (missing.nonEmpty) throw UserException(
        s"CLUSTERED BY columns not in schema: ${missing.mkString(",")}")
    }
    val partCols = otherTs.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw UserException(
        s"graft tables support only identity PARTITIONED BY columns, got $other")
    }
    // Spark-reserved entries (provider, location, owner, …) are catalog
    // bookkeeping, not table state
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION,
      TableCatalog.PROP_TABLE_TYPE)
    val userProps = properties.asScala.toMap.filterNot { case (k, _) => reserved(k) }
    val constraintProps = constraints.toSeq.flatMap {
      case c: Check =>
        // enforced natively: every write/merge/update validates its batch
        Seq(LakeTable.ConstraintPrefix + c.name -> c.predicateSql())
      case pk: PrimaryKey =>
        // informational (like the reference's PRIMARY KEY DDL) — NOT
        // under ConstraintPrefix, which is reserved for enforced CHECKs
        Seq("graft.primaryKey" ->
          pk.columns().map(_.fieldNames.mkString(".")).mkString(","))
      case other =>
        Seq(s"graft.infoConstraint.${other.name}" -> other.toDDL)
    }
    val dir = dirFor(ident)
    new LakeTable(spark, dir).createEmpty(schema, partCols,
      userProps ++ constraintProps ++
        bucketing.map(graft.lake.Bucketing.toConfig).getOrElse(Map.empty))
    new GraftTableV2(spark, dir, fullName(ident))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val lake = new LakeTable(spark, dirFor(ident))
    if (!lake.exists) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        if (add.fieldNames.length != 1) throw UserException(
          "graft supports only top-level ADD COLUMN")
        lake.alterAddColumn(add.fieldNames.head, add.dataType)
      case ren: TableChange.RenameColumn =>
        if (ren.fieldNames.length != 1) throw UserException(
          "graft supports only top-level RENAME COLUMN")
        lake.alterRenameColumn(ren.fieldNames.head, ren.newName)
      case del: TableChange.DeleteColumn =>
        if (del.fieldNames.length != 1) throw UserException(
          "graft supports only top-level DROP COLUMN")
        lake.alterDropColumn(del.fieldNames.head)
      case other => throw UserException(
        s"Unsupported ALTER TABLE change for graft tables: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!TransactionLog.tableExists(dir)) return false
    // local warehouse: a recursive delete IS the drop (an object-store
    // deployment would tombstone the log head instead)
    deleteRecursively(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val dest = dirFor(newIdent)
    Files.createDirectories(dest.getParent)
    Files.move(dirFor(oldIdent), dest)
  }

  // ---- namespaces (directories) -------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(defaultNamespace()) ||
      Files.isDirectory(namespace.foldLeft(warehouse)(_ resolve _))

  override def listNamespaces(): Array[Array[String]] = {
    val top =
      if (!Files.isDirectory(warehouse)) Seq.empty
      else withListing(warehouse)(
        _.filter(p => Files.isDirectory(p) && !TransactionLog.tableExists(p))
          .map(p => Array(p.getFileName.toString)).toSeq)
    (top :+ defaultNamespace()).distinctBy(_.toSeq).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(
      namespace: Array[String], metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && !namespace.sameElements(defaultNamespace()))
      throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(namespace.foldLeft(warehouse)(_ resolve _))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw UserException("graft namespaces carry no alterable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(warehouse)(_ resolve _)
    if (!Files.isDirectory(dir)) return false
    val nonEmpty = withListing(dir)(_.nonEmpty)
    if (nonEmpty && !cascade) throw new NonEmptyNamespaceException(namespace)
    deleteRecursively(dir)
    true
  }

  /** Directory listing with the stream CLOSED (Files.list leaks a
    * descriptor per call otherwise — SHOW TABLES in a long-lived
    * session would exhaust the ulimit).
    */
  private def withListing[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  private def deleteRecursively(dir: Path): Unit = {
    val s = Files.walk(dir)
    val all = try s.iterator().asScala.toSeq finally s.close()
    all.reverse.foreach(p => Files.deleteIfExists(p))
  }
}
