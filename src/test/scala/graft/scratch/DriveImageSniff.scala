package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the image decode stage (r11 verdict task #8):
  * renderSyntheticPngs → decodeImages over N ids, timed end to end.
  * Run before/after the sticky-SPI change to measure the per-payload
  * reader-resolution cost.
  */
object DriveImageSniff {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .appName("graft-image-sniff").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Multimodal
    val ids = spark.range(n).select(col("id").as("doc_id"))
    // render stage alone (noop sink so every payload byte materializes)
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      Multimodal.renderSyntheticPngs(ids, "doc_id")
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[imagesniff n=$n round=$round] render-only t=$t%.2f s")
    }
    // media payloads materialized once so the timed pass is decode-only
    val media = Multimodal.renderSyntheticPngs(ids, "doc_id").cache()
    media.count()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val ok = Multimodal.decodeImages(media).where(col("error").isNull).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[imagesniff n=$n round=$round] decoded=$ok t=$t%.2f s")
    }
    media.unpersist()
    spark.stop()
  }
}
