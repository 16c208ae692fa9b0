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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to rounds).foreach { r =>
      val pairs = docs.where(col("doc_id") % 37 === 0).select(col("doc_id").as("id_a"))
        .crossJoin(docs.where(col("doc_id") % 41 === 0).select(col("doc_id").as("id_b")))
        .where(col("id_a") < col("id_b"))
      val p2 = pairs.select(col("id_a"), col("id_b"))
      val tProbe = time {
        p2.queryExecution.toRdd.mapPartitions { it =>
          var n = 0L
          while (n <= (1 << 18) && it.hasNext) { it.next(); n += 1 }
          Iterator.single(n)
        }.collect()
      }
      val tCollect = time { p2.collect() }
      val full = graft.operators.Dedup.shingleOverlap(docs, "doc_id", "text", pairs)
        .select(col("id_a"), col("id_b"),
          col("n_inter").cast("long").as("n_inter"),
          col("n_union").cast("long").as("n_union"))
      val tBuild = time {
        graft.operators.Dedup.shingleOverlap(docs, "doc_id", "text", pairs)
      }
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
