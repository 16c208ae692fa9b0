package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of q23 (shingle overlap) at a given SF
  * dir: times each piece of the plan-pick + compact verify pipeline
  * separately so a wall-clock regression can be attributed to a stage
  * instead of adjudicated by guesswork (the r9 q23/q45 item).
  */
object DriveOverlap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("graft-overlap-decomp").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // arg 3: "char" runs the q45 shape (char 4-gram overlap, string
    // elements) instead of the q23 shingle shape (long hashes)
    val charMode = args.lift(2).contains("char")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to rounds).foreach { r =>
      val (ma, mb) = if (charMode) (53, 59) else (37, 41)
      val pairs = docs.where(col("doc_id") % ma === 0).select(col("doc_id").as("id_a"))
        .crossJoin(docs.where(col("doc_id") % mb === 0).select(col("doc_id").as("id_b")))
        .where(col("id_a") < col("id_b"))
      val p2 = pairs.select(col("id_a"), col("id_b"))
      val tProbe = time {
        p2.queryExecution.toRdd.mapPartitions { it =>
          var n = 0L
          while (n <= (1 << 18) && it.hasNext) { it.next(); n += 1 }
          Iterator.single(n)
        }.collect()
      }
      // the collect diagnostic mirrors the operator's small-regime
      // stage; past the probe cap the operator never collects (lazy
      // exploded plan), so neither do we — an 82M-row collect at sf10
      // just OOMs the driver without measuring anything the plan does
      val underCap = p2.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L
        while (n <= (1 << 18) && it.hasNext) { it.next(); n += 1 }
        Iterator.single(n)
      }.collect().sum <= (1 << 18)
      val tCollect = if (underCap) time { p2.collect() } else -1.0
      def overlap() =
        if (charMode)
          graft.operators.Dedup.charNgramOverlap(docs, "doc_id", "text", 4, pairs)
        else graft.operators.Dedup.shingleOverlap(docs, "doc_id", "text", pairs)
      val full = overlap()
        .select(col("id_a"), col("id_b"),
          col("n_inter").cast("long").as("n_inter"),
          col("n_union").cast("long").as("n_union"))
      val tBuild = time { overlap() }
      val tAll = time {
        full.write.format("noop").mode("overwrite").save()
      }
      println(f"[round $r] probe=$tProbe%.3f collect=$tCollect%.3f " +
        f"build(probe+collect+plan)=$tBuild%.3f consume=$tAll%.3f " +
        f"total=${tBuild + tAll}%.3f")
    }
    spark.stop()
  }
}
