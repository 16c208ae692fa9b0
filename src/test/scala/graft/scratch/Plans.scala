package graft.scratch
object Plans {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = graft.SparkEntry.configure(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q04_filter_project", "q11_top_revenue", "q12_regional_revenue", "q23_ngram_overlap", "q26_ann_lsh", "q21_dedup_minhash")) {
      println(s"\n########## $q")
      val df = graft.queries.Queries.queries(q)(spark, d)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Exchange") || l.contains("Join") ||
                     l.contains("PushedFilters") || l.contains("Window") || l.contains("Aggregate") ||
                     l.contains("WholeStageCodegen") || l.contains("Broadcast"))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
