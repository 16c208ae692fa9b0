package graft

import graft.queries.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in graft.queries.Queries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q10_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate operators whose exact mirror is meaningless).
    */
  def oracleSql: Map[String, String] = Queries.oracleSql

  /** Shared session-config contract: every entry point (Verify, Bench,
    * tests) applies these so semantics match the reference's permissive
    * ingest (ANSI off ⇒ CAST yields NULL on bad input — SURVEY.md §7.3)
    * and plans adapt at runtime (AQE).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.ansi.enabled", "false")
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS) across testdata generations. Spark 4 rejects
    // NANOS outright unless read as raw-nanos LongType — keep the
    // legacy flag so ns files stay readable; query logic adapts to
    // whichever physical type is bound (functions.TimeFunctions).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    // Runtime (AQE) broadcast decisions use MEASURED shuffle-stage
    // sizes, so a higher ceiling is safe by construction: a fact-sized
    // side never broadcasts (its observed size exceeds the ceiling and
    // the join stays sort-merge), while a filtered/pre-joined side
    // that MEASURES small — the orders⋈dims side of a TPC-H Q5-shape
    // star after its date filter — flips to broadcast-hash and deletes
    // the big fact exchange. 64 MB per executor is comfortable on any
    // cluster this engine targets; the STATIC threshold (estimates,
    // not measurements) stays at Spark's conservative default.
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
    // Runtime bloom filters: a selective dimension/filter side of a
    // shuffle join injects a bloom filter of its join keys into the
    // fact side's scan, so the big exchange carries only rows that
    // can survive the join (TPC-H Q5 shape: lineitem drops to the
    // ~30% of rows whose order passes the date filter BEFORE its 6M-row
    // shuffle). The filter itself is KB-scale regardless of data
    // scale — exactly the mechanism a 100 TB star join needs. The
    // creation-side ceiling rises with the broadcast ceiling above
    // (Spark's 10 MB default predates the memory of any current
    // executor).
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the cluster-deployment pair every entry point carries: native
    // functions + SQL DML rules, and the graft TableCatalog so
    // `graft.<schema>.<table>` resolves (same two lines a real
    // spark-submit would pass as --conf)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.catalog.graft", "graft.lake.v2.GraftCatalog")
    .config("spark.sql.catalog.graft.warehouse", warehouseDir)

  /** Session-scoped catalog warehouse (tests/Verify/Bench create
    * per-query tables under it; a deployment overrides the conf).
    */
  lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString
}
