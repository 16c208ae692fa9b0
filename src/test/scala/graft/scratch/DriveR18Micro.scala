package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r18 measurement driver: times the candidate formulations of q13
  * (window decimal sum) and q49 (dfreq stage) head to head on one
  * session, noop sink, min of `iters`. Usage:
  *   sbt "Test/runMain graft.scratch.DriveR18Micro <sfDir> [iters]"
  */
object DriveR18Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(mk: => DataFrame): Unit = {
      val secs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        s
      }
      println(f"[micro] $name%-28s min=${secs.min}%.3f  all=${secs.map(x => f"$x%.3f").mkString(",")}")
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // ---- q13: running decimal sum over a window frame ----
    def dec2(c: org.apache.spark.sql.Column) =
      graft.functions.DecimalFunctions.moneyCast(c, 18, 2)
    val w13 = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame13 = w13.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q13(sumForm: org.apache.spark.sql.Column): DataFrame =
      orders.withColumn("rn", row_number().over(w13).cast("long"))
        .withColumn("run_spend", sumForm)
        .select(col("o_orderkey"), col("rn"),
          round(col("run_spend"), 2).cast("double").as("run_spend"))
    time("q13 builtin sum")(q13(sum(dec2(col("o_totalprice"))).over(frame13)))
    time("q13 graft_decimal_sum")(q13(
      graft.functions.DecimalFunctions.decimalSum(dec2(col("o_totalprice"))).over(frame13)))

    // ---- q49: dfreq formulations ----
    val n = docs.count()
    def tfBase: DataFrame =
      graft.operators.Dedup.rebalance(
        docs.select(col("doc_id"), col("text").as("t")))
        .select(col("doc_id"),
          explode(graft.functions.TextKernelFunctions.wordTf(col("t"))).as("wt"))
        .select(col("doc_id"), col("wt.word").as("word"), col("wt.tf").as("tf"))
    def rankAndTrim(joined: DataFrame): DataFrame = {
      val qscore = floor(col("tf") * log(lit(n.toDouble) / col("dfreq")) * lit(1e6))
        .cast("long")
      val w = Window.partitionBy("doc_id")
        .orderBy(col("qscore").desc, col("tf").desc, col("word").asc)
      joined.withColumn("qscore", qscore)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"), col("word"),
          col("tf"), col("dfreq"))
    }
    time("q49 window dfreq (r17)") {
      rankAndTrim(tfBase.withColumn("dfreq",
        count(lit(1)).over(Window.partitionBy("word"))))
    }
    time("q49 checkpoint+bjoin (r18)") {
      val tf = tfBase.localCheckpoint(true)
      val dfr = tf.groupBy("word").agg(count(lit(1)).as("dfreq"))
        .select(col("word").as("__w"), col("dfreq"))
      val head = dfr.collect()
      val local = spark.createDataFrame(
        java.util.Arrays.asList(head: _*), dfr.schema).toDF("__w", "dfreq")
      rankAndTrim(tf.join(broadcast(local), col("word") <=> col("__w")).drop("__w"))
    }
    time("q49 recompute+bjoin") {
      val dfr = tfBase.groupBy("word").agg(count(lit(1)).as("dfreq"))
        .select(col("word").as("__w"), col("dfreq"))
      val head = dfr.collect()
      val local = spark.createDataFrame(
        java.util.Arrays.asList(head: _*), dfr.schema).toDF("__w", "dfreq")
      rankAndTrim(tfBase.join(broadcast(local), col("word") <=> col("__w")).drop("__w"))
    }
    spark.stop()
  }
}
