package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-MERGE adjudication (r11 verdict task #6): at sf1, merge a
  * 2%-selectivity delta into the same orders table stored (a)
  * unbucketed and (b) bucketed on the merge key, under both
  * copy-on-write and merge-on-read, and print per-batch merge wall
  * time. The bucketed target's probe join never exchanges the target
  * side (the scan reports HashPartitioning) and the probe scan list is
  * cut to the buckets the source keys hash into
  * (LakeTable.bucketPrunedSnapshot).
  */
object DriveBucketMerge {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/testdata/sf1"
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .appName("graft-bucket-merge").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lake.{Bucketing, LakeTable}

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // ts column dropped: its physical encoding varies across testdata
    // generations and is irrelevant to the merge shape being measured
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val n = orders.count()
    // the q59-adjudicated regime: ~2% scattered keys per batch
    def delta(salt: Int) = orders
      .where(pmod(col("o_orderkey") + salt, lit(50)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderpriority", lit(s"UPD$salt"))

    for (mor <- Seq(false, true); bucketed <- Seq(false, true)) {
      val base = java.nio.file.Files.createTempDirectory("graft-bmerge").toString
      val t = LakeTable.forPath(spark, s"$base/orders")
      val (_, tWrite) = time {
        t.write(orders, "overwrite",
          bucketBy = if (bucketed) Some(Bucketing(32, Seq("o_orderkey"))) else None)
      }
      if (mor) t.alterSetProperties(Map("graft.merge.mode" -> "merge-on-read"))
      val times = (1 to 3).map { i =>
        val (_, tm) = time { t.merge(delta(i), Seq("o_orderkey")) }
        tm
      }
      val rows = t.read().count()
      println(f"[bmerge $d mor=$mor bucketed=$bucketed] rows=$rows/$n " +
        f"tWrite=$tWrite%.1f merges=${times.map(x => f"$x%.2f").mkString(",")} " +
        f"minMerge=${times.min}%.2f")
    }
    spark.stop()
  }
}
