package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM decomposition of the r7 focus queries (q14 distinct-agg,
  * q16 JSON, q31 top-k) into scan / operator / exchange components at
  * sf1, plus min-of-5 re-times of the star-aggregate family after the
  * int128 + cast-hoist changes.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")

    def time(name: String, n: Int = 5)(df: => DataFrame): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val events = spark.read.parquet(s"$sf/events.parquet")

    // ---- q14 distinct agg ----
    time("q14/scan") {
      orders.select("o_orderpriority", "o_custkey", "o_orderdate")
    }
    time("q14/plain-agg") {
      orders.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n"), min("o_orderdate"), max("o_orderdate"))
    }
    time("q14/distinct-pairs-only") {
      orders.select("o_orderpriority", "o_custkey").distinct()
    }
    time("q14/full") {
      orders.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
    }
    // two-level manual alternative: one exchange on (prio,cust), then
    // a tiny second agg — does it beat Expand/two-agg planning?
    time("q14/two-level") {
      orders.groupBy("o_orderpriority", "o_custkey").agg(
        count(lit(1)).as("n"), min("o_orderdate").as("f"), max("o_orderdate").as("l"))
        .groupBy("o_orderpriority").agg(
          sum("n").as("n_orders"), count(lit(1)).as("n_cust"),
          min("f").as("first_date"), max("l").as("last_date"))
    }

    // ---- q16 JSON ----
    val reb = graft.operators.Dedup.rebalance(events)
    time("q16/scan") { events.select("event_type", "user_id", "value", "props") }
    time("q16/jackson-project") {
      reb.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
    }
    time("q16/kernel-project") {
      reb.select(graft.functions.JsonKernelFunctions.jsonLong(col("props"), "k").as("k"))
    }
    time("q16/kernel-project-noreb") {
      events.select(graft.functions.JsonKernelFunctions.jsonLong(col("props"), "k").as("k"))
    }
    time("q16/full-new") { graft.queries.Queries.queries("q16_events_json")(spark, sf) }

    // ---- q31 top-k per group ----
    import org.apache.spark.sql.expressions.Window
    time("q31/scan") { orders.select("o_orderpriority", "o_totalprice", "o_orderkey") }
    time("q31/full") { graft.queries.Queries.queries("q31_topk_per_group")(spark, sf) }
    // floor: same scan + a plain 5-group agg (no per-partition top-k state)
    time("q31/agg-floor") {
      orders.groupBy("o_orderpriority").agg(max("o_totalprice"), max("o_orderkey"))
    }

    // ---- q12 star join ----
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    time("q12/lineitem-scan") {
      lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    }
    time("q12/orders-side-only") {
      val region = spark.read.parquet(s"$sf/region.parquet").where(col("r_name") === "ASIA")
      val nation = spark.read.parquet(s"$sf/nation.parquet")
      val cust = spark.read.parquet(s"$sf/customer.parquet")
      val ord = orders.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      broadcast(region)
        .join(broadcast(nation), col("r_regionkey") === col("n_regionkey"))
        .join(cust, col("n_nationkey") === col("c_nationkey"))
        .join(ord, col("c_custkey") === col("o_custkey"))
        .select("o_orderkey", "n_name", "c_nationkey")
    }

    // ---- q15 same-source membership ----
    time("q15/scan") { orders.select("o_custkey", "o_orderstatus") }
    time("q15/distinct-custkeys") { orders.select("o_custkey").distinct() }

    // ---- star family re-times ----
    for (q <- Seq("q10_pricing_summary", "q11_top_revenue", "q12_regional_revenue",
        "q15_setops", "q16_events_json", "q19_rollup", "q43_cube", "q44_pivot",
        "q14_distinct_agg", "q31_topk_per_group"))
      time(q) { graft.queries.Queries.queries(q)(spark, sf) }

    spark.stop()
  }
}
