package graft.scratch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Retime {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/tmp/testdata/sf1"
    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def topk(src: DataFrame) = src
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
    time("roundrobin") { topk(orders.repartition(32)) }
    time("hash-okey") { topk(orders.repartition(32, col("o_orderkey"))) }
    time("none") { topk(orders) }
    time("rr-nosortflag") {
      spark.conf.set("spark.sql.execution.sortBeforeRepartition", "false")
      val r = topk(orders.repartition(32))
      r
    }
    spark.conf.set("spark.sql.execution.sortBeforeRepartition", "true")
    spark.stop()
  }
}
