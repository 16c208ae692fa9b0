package graft.scratch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DecimalFunctions.{decimalSum, decimalSumProduct, moneyCast}
object Retime {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/testdata/sf1/lineitem.parquet")
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
    def dec2(c: org.apache.spark.sql.Column) = moneyCast(c, 18, 2)
    def dec82(c: org.apache.spark.sql.Column) = moneyCast(c, 8, 2)
    def cast2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def cast82(c: org.apache.spark.sql.Column) = c.cast("decimal(8,2)")
    val one = lit(1).cast("decimal(8,2)")
    def time(name: String, n: Int = 7)(df: => DataFrame): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s min=${ts.min}%.3f med=${ts.sorted.apply(n/2)}%.3f")
    }
    def aggOf(q: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column,
        dm: org.apache.spark.sql.Column, tp: org.apache.spark.sql.Column) =
      li.groupBy("l_returnflag", "l_linestatus").agg(
        decimalSum(q), decimalSum(p), decimalSumProduct(p, dm),
        decimalSumProduct(p, dm, tp), count(lit(1)))
    // interleave to cancel drift
    for (r <- 1 to 2) {
      time(s"r$r/fused-inline") {
        aggOf(dec2(col("l_quantity")), dec2(col("l_extendedprice")),
          one - dec82(col("l_discount")), one + dec82(col("l_tax")))
      }
      time(s"r$r/money-hoisted") {
        li.select(col("l_returnflag"), col("l_linestatus"),
          dec2(col("l_quantity")).as("q"), dec2(col("l_extendedprice")).as("p"),
          (one - dec82(col("l_discount"))).as("dm"), (one + dec82(col("l_tax"))).as("tp"))
          .groupBy("l_returnflag", "l_linestatus").agg(
            decimalSum(col("q")), decimalSum(col("p")), decimalSumProduct(col("p"), col("dm")),
            decimalSumProduct(col("p"), col("dm"), col("tp")), count(lit(1)))
      }
      time(s"r$r/cast-hoisted") {
        li.select(col("l_returnflag"), col("l_linestatus"),
          cast2(col("l_quantity")).as("q"), cast2(col("l_extendedprice")).as("p"),
          (one - cast82(col("l_discount"))).as("dm"), (one + cast82(col("l_tax"))).as("tp"))
          .groupBy("l_returnflag", "l_linestatus").agg(
            decimalSum(col("q")), decimalSum(col("p")), decimalSumProduct(col("p"), col("dm")),
            decimalSumProduct(col("p"), col("dm"), col("tp")), count(lit(1)))
      }
      time(s"r$r/double-floor") {
        li.groupBy("l_returnflag", "l_linestatus").agg(
          sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))), count(lit(1)))
      }
    }
    spark.stop()
  }
}
