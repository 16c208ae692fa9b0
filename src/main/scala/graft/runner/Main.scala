package graft.runner

import graft.core._
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}

/** CLI entry point mirroring the component's __main__ contract
  * (/root/reference/src/component.py:428-438): run the configured
  * action; UserException → stderr + exit 1, anything else → exit 2.
  *
  * Primary form — a Keboola datadir, like the reference container:
  *   graft.runner.Main <dataDir> [destTablePath]
  * reads `<dataDir>/config.json`, builds the session from the config's
  * resource knobs (threads / batch_size / debug — Sessions.forConfig),
  * and dispatches `config.action` exactly like `execute_action()`:
  * "run" (default) writes the lake table; the sync actions
  * (list_uc_catalogs, …) print their elements.
  *
  * When destTablePath is omitted, the destination resolves under
  * $GRAFT_WAREHOUSE_DIR (default `<dataDir>/out/tables`) from the
  * config's destination fields: catalog/schema/table for native
  * tables, container/blob for external — the local analog of the
  * reference's cloud URIs (component.py:50-51, 306-330).
  *
  * Legacy positional form (kept for scripting):
  *   graft.runner.Main run <dataDir> <destTablePath> [mode] [external|native] [partitionBy,csv]
  *   graft.runner.Main <action> [args...]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val code = UserException.exitCodeOf {
      args.toList match {
        case dataDir :: rest
            if Files.exists(Paths.get(dataDir).resolve("config.json")) =>
          val dd = DataDirConfig.load(Paths.get(dataDir))
          val spark = Sessions.forConfig(dd.config)
          try executeDataDir(spark, dd, Paths.get(dataDir), rest.headOption.map(Paths.get(_)))
          finally spark.stop()
        case legacy =>
          val spark = graft.SparkEntry.configure(
            SparkSession.builder()
              .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
              .config("spark.sql.shuffle.partitions",
                sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
            .getOrCreate()
          try execute(spark, legacy)
          finally spark.stop()
      }
    }
    if (code != 0) sys.exit(code)
  }

  /** UC client factory seam: the sandbox has no network, so the
    * default refuses with a clear error; specs (and a real deployment
    * wrapping the databricks SDK) install their own.
    */
  @volatile private[graft] var ucClientFactory: Config => UcClient = cfg =>
    throw UserException(
      "Unity Catalog access requires a reachable endpoint" +
        (if (cfg.unityCatalogUrl.nonEmpty) s" (unity_catalog_url=${cfg.unityCatalogUrl})"
         else "") + "; no UcClient is configured in this environment")

  /** `factory` defaults to the global seam; tests pass their mock
    * explicitly instead of mutating the shared var (suites run in
    * parallel in the forked JVM).
    */
  private[graft] def credentialProviderFor(
      cfg: Config,
      factory: Config => UcClient = ucClientFactory): CredentialProvider =
    cfg.accessMethod match {
      case AccessMethod.UnityCatalog => new UnityCatalogCredentials(factory(cfg))
      case _                         => DirectStorageCredentials
    }

  /** Local destination path for a config's destination fields. */
  private[graft] def resolveDest(cfg: Config, dataDir: Path): Path = {
    val base = sys.env.get("GRAFT_WAREHOUSE_DIR").map(Paths.get(_))
      .getOrElse(dataDir.resolve("out/tables"))
    val d = cfg.destination
    val segs: Seq[String] = cfg.destination.tableType match {
      case TableType.Native =>
        Seq(d.catalog, d.schemaName, d.table).filter(_.nonEmpty)
      case TableType.External =>
        if (d.containerName.nonEmpty || d.blobName.nonEmpty)
          Seq(d.containerName, d.blobName).filter(_.nonEmpty)
        else Seq(d.catalog, d.schemaName, d.table).filter(_.nonEmpty)
    }
    if (segs.isEmpty)
      throw UserException(
        "Validation Error: destination: table (or container_name/blob_name) required to resolve the destination path")
    segs.foldLeft(base)(_.resolve(_))
  }

  /** Dispatches a datadir config's action — the execute_action()
    * analog (component.py:431-432; sync-action names :387-425).
    */
  private[graft] def executeDataDir(
      spark: SparkSession,
      dd: DataDirConfig,
      dataDir: Path,
      destOverride: Option[Path]): Unit = {
    val cfg = dd.config
    dd.action match {
      case "run" =>
        // cloud-provider configs resolve credentials through the seam;
        // locally the resulting Hadoop conf entries are inert.
        // access_method=unity_catalog routes through the UC provider so
        // the reference's missing-table / permission-denied errors
        // (component.py:117-133) surface on real runs, not just specs.
        credentialProviderFor(cfg).resolve(cfg).applyTo(spark)
        Runner.run(spark, cfg, dataDir, destOverride.getOrElse(resolveDest(cfg, dataDir)))
      case "list_uc_catalogs" =>
        Actions.listCatalogs(spark).foreach(e => println(e.value))
      case "list_uc_schemas" =>
        Actions.listSchemas(spark).foreach(e => println(e.value))
      case "list_uc_tables" =>
        val db = if (cfg.destination.schemaName.nonEmpty) cfg.destination.schemaName else "default"
        Actions.listTables(spark, db).foreach(e => println(e.value))
      case "list_warehouses" =>
        Actions.listWarehouses(spark).foreach(e => println(e.label))
      case "list_table_columns" =>
        val tables = TableDef.fromDataDir(dataDir)
        if (tables.isEmpty)
          throw UserException("Can list only columns from input tables, not files.")
        Actions.listTableColumns(tables.head)
          .foreach(e => println(s"${e.value}\t${e.label}"))
      case other =>
        throw UserException(s"Unknown action: $other")
    }
  }

  private[runner] def execute(spark: SparkSession, args: List[String]): Unit =
    args match {
      case "run" :: dataDir :: dest :: rest =>
        val mode = rest.headOption.getOrElse("append")
        val tt = rest.drop(1).headOption.getOrElse("external")
        val parts = rest.drop(2).headOption
          .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
        val cfg = Config.validated(Config(destination = Destination(
          mode = LoadType.withName(mode),
          tableType = TableType.withName(tt),
          partitionBy = parts,
          warehouse = if (tt == "native") "local" else "")))
        Runner.run(spark, cfg, Paths.get(dataDir), Paths.get(dest))
      case "list_catalogs" :: Nil =>
        Actions.listCatalogs(spark).foreach(e => println(e.value))
      case "list_schemas" :: Nil =>
        Actions.listSchemas(spark).foreach(e => println(e.value))
      case "list_tables" :: db :: Nil =>
        Actions.listTables(spark, db).foreach(e => println(e.value))
      case "list_warehouses" :: Nil =>
        Actions.listWarehouses(spark).foreach(e => println(e.label))
      case "list_table_columns" :: manifest :: Nil =>
        Actions.listTableColumns(TableDef.fromManifest(Paths.get(manifest)))
          .foreach(e => println(s"${e.value}\t${e.label}"))
      case other =>
        throw UserException(s"Unknown action or arguments: ${other.mkString(" ")}")
    }
}
