package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18: times the OLD (two-scan + id join) vs NEW (fused single-scan)
  * lshVerifiedClusterEdges formulations, edges-only and through the
  * full q66 pipeline. Usage:
  *   sbt "Test/runMain graft.scratch.DriveEdgesTiming <sfDir> [iters]"
  */
object DriveEdgesTiming {
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
    import graft.operators.{Dedup, ConnectedComponents}

    def time(name: String)(mk: => DataFrame): Unit = {
      val secs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        s
      }
      println(f"[edges] $name%-24s min=${secs.min}%.3f  all=${secs.map(x => f"$x%.3f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (k, bands, minJ) = (8, 4, 0.5)

    // OLD form (r17): two scans united by an id join
    def oldEdges: DataFrame = {
      val buckets = Dedup.bandBuckets(
        Dedup.minhashSignatures(docs, "doc_id", "text", k), k, bands)
      val grams = Dedup.rebalance(docs.select(col("doc_id").cast("long").as("id"),
          col("text").as("t")))
        .where(col("t").isNotNull)
        .select(col("id"), sort_array(
          graft.functions.TextKernelFunctions.shingleHashes(col("t"))).as("elems"))
      val joined = buckets.join(grams, Seq("id"))
        .select(col("bucket"), col("id"), col("elems"))
        .as[(Long, Long, Array[Long])]
      verify(joined)
    }
    def verify(src: org.apache.spark.sql.Dataset[(Long, Long, Array[Long])]): DataFrame =
      src.groupByKey(_._1)
        .flatMapGroups { (_: Long, it: Iterator[(Long, Long, Array[Long])]) =>
          val members = it.map(m => (m._2, m._3)).toArray
          scala.util.Sorting.quickSort(members)(Ordering.by(_._1))
          val nm = members.length
          val parent = Array.tabulate(nm)(identity)
          def find(x: Int): Int = {
            var r = x
            while (parent(r) != r) r = parent(r)
            var c = x
            while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var i = 0
          while (i < nm - 1) {
            var j = i + 1
            while (j < nm) {
              val ri = find(i); val rj = find(j)
              if (ri != rj) {
                val ea = members(i)._2; val eb = members(j)._2
                val ni = graft.functions.SetKernels
                  .sortedIntersectCountLongArrays(ea, eb)
                if (ni >= minJ * (ea.length + eb.length - ni)) {
                  if (ri < rj) parent(rj) = ri else parent(ri) = rj
                  out += ((members(i)._1, members(j)._1))
                }
              }
              j += 1
            }
            i += 1
          }
          out.iterator
        }
        .toDF("id_a", "id_b")

    time("edges OLD (join)")(oldEdges)
    time("edges NEW (fused)")(
      Dedup.lshVerifiedClusterEdges(docs, "doc_id", "text", k, bands, minJ))
    time("q66 NEW end-to-end") {
      Dedup.dedupCorpusVerified(docs, "doc_id", "text", k, bands, minJ)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    }
    time("q66 OLD end-to-end") {
      val keep = ConnectedComponents.labels(docs, "doc_id", oldEdges)
        .where(col("id") === col("component")).select(col("id").as("doc_id"))
      docs.join(keep, Seq("doc_id"), "left_semi")
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    }
    spark.stop()
  }
}
