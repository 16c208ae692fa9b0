package graft.runner

import graft.core._
import org.apache.spark.sql.SparkSession

import java.nio.file.Paths

/** CLI entry point mirroring the component's __main__ contract
  * (/root/reference/src/component.py:428-438): run the configured
  * action; UserException → stderr + exit 1, anything else → exit 2.
  *
  * Usage:
  *   graft.runner.Main run <dataDir> <destTablePath> [mode] [external|native] [partitionBy,csv]
  *   graft.runner.Main <action> [args...]   (list_catalogs, list_schemas, ...)
  */
object Main {
  def main(args: Array[String]): Unit = {
    val code = UserException.exitCodeOf {
      val spark = graft.SparkEntry.configure(
        SparkSession.builder()
          .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
        .getOrCreate()
      try execute(spark, args.toList)
      finally spark.stop()
    }
    if (code != 0) sys.exit(code)
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
