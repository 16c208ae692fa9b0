package graft.runner

import graft.core.Config
import org.apache.spark.sql.SparkSession

/** Session factory honoring the component's execution-resource knobs
  * (X1, SURVEY.md §2.9): `threads` → local parallelism, `max_memory`
  * (MB) → driver memory hint, spill dir → `spark.local.dir`. The
  * reference applies these to its embedded DuckDB session
  * (/root/reference/src/component.py:367-384, defaults
  * configuration.py:53-54); here they shape the local Spark session.
  *
  * `spark.driver.memory` only takes effect before JVM launch, so the
  * memory knob is applied to the off-heap-ish knobs that do apply at
  * session-create time (shuffle spill threshold); callers launching a
  * fresh JVM pass it through `SPARK_DRIVER_MEM` (see build.sbt).
  */
object Sessions {

  /** The session settings a Config implies — pure and spec-testable
    * (getOrCreate in a shared JVM may reuse an existing context, so
    * the mapping itself is the verifiable contract).
    */
  def sparkConfFor(cfg: Config): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    m += "spark.master" -> s"local[${cfg.threads}]"
    m += "spark.sql.shuffle.partitions" -> math.max(cfg.threads, 1).toString
    // batch_size: the reference writes the input in N-row Arrow
    // batches (component.py:82, 89-111); the Spark analog is the
    // writer's per-file row cap — output files chunk at the same
    // granularity, and the setting is plan-visible
    m += "spark.sql.files.maxRecordsPerFile" -> cfg.batchSize.toString
    sys.env.get("GRAFT_SPILL_DIR").foreach(d => m += "spark.local.dir" -> d)
    m.result()
  }

  def forConfig(cfg: Config, appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder().appName(appName)
    sparkConfFor(cfg).foreach { case (k, v) => b.config(k, v) }
    val spark = graft.SparkEntry.configure(b).getOrCreate()
    // debug: observable semantics = Spark log level, like the
    // reference's logging.DEBUG toggle
    if (cfg.debug) spark.sparkContext.setLogLevel("DEBUG")
    spark
  }
}
