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
    // Defaults DELIBERATELY kept for the AQE broadcast threshold and
    // runtime bloom filters: both were measured 2x2 at sf0.1 AND sf1
    // (BENCHNOTES_r7) — a 64 MB runtime-broadcast ceiling made the Q5
    // star and the MERGE join SLOWER (driver build/collect of a
    // 10-40 MB hashed relation costs more than the shuffle it
    // replaces at every tested width), and injected bloom filters
    // priced in at roughly their own build cost (the exchange they
    // prune is only ~3x reducible here). Deployments with slower
    // interconnects than a single host can revisit; the session
    // default follows the measurements, not the theory.
    .config("spark.sql.session.timeZone", "UTC")
    // Join strategy (guide §3.1): let AQE rewrite a planned sort-merge
    // join to SHUFFLED HASH at runtime when every post-shuffle
    // partition's map output is under 64 MB (default 0 = never) — the
    // SMJ's two sorts are pure overhead whenever the per-partition
    // build fits, and 64 MB per task is modest against any practical
    // executor sizing (the bound is per-task, not cluster-sized).
    // Deliberately RUNTIME-only: statically preferring SHJ
    // (spark.sql.join.preferSortMergeJoin=false) measured 2.2x WORSE
    // at sf1 — a static SHJ forgoes the runtime SMJ→broadcast
    // promotion AQE gives mid-sized sides — while the AQE rewrite
    // keeps broadcast first and hashes only what stays a shuffle join.
    // Measured r17 (OPTIMIZATION_r17.md): sf10 q11 4.16→2.78 s,
    // q12 6.38→3.88 s, q09 1.99→1.60 s; sf1/sf0.1 flat; hash vs merge
    // is execution strategy only — 82/82 oracle re-proven after.
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
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
