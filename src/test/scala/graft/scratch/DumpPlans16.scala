package graft.scratch

import org.apache.spark.sql.SparkSession

/** r16 plan audit: dump optimized+physical plans for the new/changed
  * queries (q71 join-back gate, q74/q75 chunked LSH/IVF, q76 composite
  * quota, q77 all-pairs near-dup, q78 includeSelf role swap).
  */
object DumpPlans16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = Seq("q71_weighted_quota_rows", "q74_ann_lsh_chunked",
      "q75_ann_ivf_chunked", "q76_quota_composite",
      "q77_neardup_allpairs", "q78_ann_allpairs")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val df = qs(n)(spark, dir)
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
      val s = df.queryExecution.executedPlan.toString +
        df.queryExecution.optimizedPlan.toString
      println(s"kernel-dup check: corpus_topk=${
        "graft_corpus_topk".r.findAllIn(s).length}, probe_matches=${
        "graft_probe_matches".r.findAllIn(s).length}, probe_topk=${
        "graft_probe_topk".r.findAllIn(s).length}")
    }
    spark.stop()
  }
}
