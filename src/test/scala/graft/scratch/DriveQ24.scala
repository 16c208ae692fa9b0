package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriveQ24 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val spark = SparkSession.builder()
      .appName("graft-q24").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"rows=${emb.count()} scanParts=${emb.rdd.getNumPartitions}")

    val q = graft.operators.Dedup.embeddingNearDup(
      emb, "vec_id", "embedding",
      probeFilter = col("vec_id") % 20 === 0, threshold = 0.2)
    q.explain("formatted")
    println(s"outputParts=${q.rdd.getNumPartitions}")
    // bounded probe subset for a timed sample: 1/400th of the pairs
    val qSmall = graft.operators.Dedup.embeddingNearDup(
      emb, "vec_id", "embedding",
      probeFilter = col("vec_id") % 400 === 0, threshold = 0.2)
    val t0 = System.nanoTime()
    println(s"smallPairs=${qSmall.count()}")
    println(f"q24small wall ${(System.nanoTime() - t0) / 1e9}%.1f s (x20 for full)")
    spark.stop()
  }
}
