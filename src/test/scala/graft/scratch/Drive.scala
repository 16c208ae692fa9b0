package graft.scratch

import graft.functions.DecimalFunctions.{decimalSum, decimalSumProduct}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM decomposition of the q10 star-aggregate cost:
  * built-in decimal sum vs int128 kernel vs double sum.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/tmp/testdata/sf1/lineitem.parquet")
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))

    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def dec82(c: org.apache.spark.sql.Column) = c.cast("decimal(8,2)")
    val one = lit(1).cast("decimal(8,2)")

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("scan-only") {
      li.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
    }
    time("double-sum") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity")).as("dq"),
        sum(col("l_extendedprice")).as("dp"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("ddp"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("dc"),
        count(lit(1)).as("n"))
    }
    time("builtin-decimal-sum") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(dec2(col("l_quantity"))).as("dq"),
        sum(dec2(col("l_extendedprice"))).as("dp"),
        sum(dec2(col("l_extendedprice")) * (one - dec82(col("l_discount")))).as("ddp"),
        sum(dec2(col("l_extendedprice")) * (one - dec82(col("l_discount"))) *
          (one + dec82(col("l_tax")))).as("dc"),
        count(lit(1)).as("n"))
    }
    time("cast-only") {
      li.select(dec2(col("l_quantity")).as("a"), dec2(col("l_extendedprice")).as("b"),
        (one - dec82(col("l_discount"))).as("c"), (one + dec82(col("l_tax"))).as("d"))
    }
    // pre-materialized decimal inputs isolate the ACCUMULATOR cost
    val pre = li.select(col("l_returnflag"), col("l_linestatus"),
      dec2(col("l_quantity")).as("q"), dec2(col("l_extendedprice")).as("p"),
      (one - dec82(col("l_discount"))).as("dm"), (one + dec82(col("l_tax"))).as("tp"))
      .cache()
    pre.count()
    time("pre+builtin-sum") {
      pre.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("q")), sum(col("p")), sum(col("p") * col("dm")),
        sum(col("p") * col("dm") * col("tp")), count(lit(1)))
    }
    time("pre+int128-kernel") {
      pre.groupBy("l_returnflag", "l_linestatus").agg(
        decimalSum(col("q")), decimalSum(col("p")),
        decimalSumProduct(col("p"), col("dm")),
        decimalSumProduct(col("p"), col("dm"), col("tp")), count(lit(1)))
    }
    // 32-way rebalanced variants: does spreading the 6-row-group scan help?
    val reb = graft.operators.Dedup.rebalance(li)
    time("rebal+builtin-dec") {
      reb.groupBy("l_returnflag", "l_linestatus").agg(
        sum(dec2(col("l_quantity"))), sum(dec2(col("l_extendedprice"))),
        sum(dec2(col("l_extendedprice")) * (one - dec82(col("l_discount")))),
        sum(dec2(col("l_extendedprice")) * (one - dec82(col("l_discount"))) *
          (one + dec82(col("l_tax")))), count(lit(1)))
    }
    time("rebal+int128-kernel") {
      reb.groupBy("l_returnflag", "l_linestatus").agg(
        decimalSum(dec2(col("l_quantity"))), decimalSum(dec2(col("l_extendedprice"))),
        decimalSumProduct(dec2(col("l_extendedprice")), one - dec82(col("l_discount"))),
        decimalSumProduct(dec2(col("l_extendedprice")), one - dec82(col("l_discount")),
          one + dec82(col("l_tax"))), count(lit(1)))
    }
    time("int128-kernel") {
      li.groupBy("l_returnflag", "l_linestatus").agg(
        decimalSum(dec2(col("l_quantity"))).as("dq"),
        decimalSum(dec2(col("l_extendedprice"))).as("dp"),
        decimalSumProduct(dec2(col("l_extendedprice")),
          one - dec82(col("l_discount"))).as("ddp"),
        decimalSumProduct(dec2(col("l_extendedprice")),
          one - dec82(col("l_discount")), one + dec82(col("l_tax"))).as("dc"),
        count(lit(1)).as("n"))
    }
    // casts projected BEFORE the groupBy (no cache): does hoisting the
    // cast out of the aggregate update expressions recover pre+kernel?
    def proj = li.select(col("l_returnflag"), col("l_linestatus"),
      dec2(col("l_quantity")).as("q"), dec2(col("l_extendedprice")).as("p"),
      (one - dec82(col("l_discount"))).as("dm"), (one + dec82(col("l_tax"))).as("tp"))
    time("proj+int128-kernel") {
      proj.groupBy("l_returnflag", "l_linestatus").agg(
        decimalSum(col("q")), decimalSum(col("p")),
        decimalSumProduct(col("p"), col("dm")),
        decimalSumProduct(col("p"), col("dm"), col("tp")), count(lit(1)))
    }
    time("proj+builtin-sum") {
      proj.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("q")), sum(col("p")), sum(col("p") * col("dm")),
        sum(col("p") * col("dm") * col("tp")), count(lit(1)))
    }
    spark.stop()
  }
}
