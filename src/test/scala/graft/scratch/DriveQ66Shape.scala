package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriveQ66Shape {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/testdata/sf10"
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .appName("graft-q66-shape").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4)
    val agg = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .agg(count(lit(1)).as("n2"), countDistinct(col("id")).as("ids")).head()
    println(s"[q66shape $d] pairRows×2=${agg.getLong(0)} distinctIds=${agg.getLong(1)}")
    spark.stop()
  }
}
