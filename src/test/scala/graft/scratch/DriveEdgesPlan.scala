package graft.scratch

import org.apache.spark.sql.SparkSession

/** One-off plan probe for the r18 fused lshVerifiedClusterEdges scan:
  * prints the optimized plan of the EDGES frame (which q66 executes
  * eagerly inside ConnectedComponents, so DumpQueryPlans never sees
  * it) and counts kernel occurrences — the fuse is only a win if each
  * kernel is evaluated ONCE per row.
  */
object DriveEdgesPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = graft.operators.Dedup.lshVerifiedClusterEdges(
      docs, "doc_id", "text", k = 8, bands = 4, minJaccard = 0.5)
    val plan = edges.queryExecution.optimizedPlan.toString
    println(plan)
    val nMinhash = "graft_minhash_signature".r.findAllIn(plan).length
    val nShingle = "graft_shingle_hashes".r.findAllIn(plan).length
    println(s"== minhash kernel refs: $nMinhash, shingle kernel refs: $nShingle")
    spark.stop()
  }
}
