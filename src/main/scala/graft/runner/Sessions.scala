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
  def forConfig(cfg: Config, appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[${cfg.threads}]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", math.max(cfg.threads, 1).toString)
    sys.env.get("GRAFT_SPILL_DIR").foreach(d => b.config("spark.local.dir", d))
    graft.SparkEntry.configure(b).getOrCreate()
  }
}
