package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q47/q50 sf-scaling decomposition (the r9-deferred adjudication):
  * separates LSH edge growth from contraction/shuffle cost at each
  * scale. Prints, per sfDir: signature+banding time, candidate-pair
  * (edge) count, duplicate-cluster structure (buckets, largest), and
  * the labels() wall time — so a superlinear q47 reading can be
  * attributed to edge growth vs plan-path change (union-find fast
  * path vs distributed rounds) vs shuffle amplification.
  */
object DriveCC {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/testdata/sf1", "/tmp/testdata/sf10")
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .appName("graft-cc-decomp").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{ConnectedComponents, Dedup}

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val nDocs = docs.count()
      // stage 1: signatures + banding (map-side) — bucket structure
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8)
      val buckets = Dedup.bandBuckets(sigs, 8, 4)
        .groupBy("bucket").agg(countDistinct("id").as("n"))
        .where(col("n") > 1)
      val (bstats, tBuckets) = time {
        buckets.agg(count(lit(1)), max(col("n")),
          sum(col("n") * (col("n") - 1) / 2)).collect()(0)
      }
      val nBuckets = bstats.getLong(0)
      val maxBucket = if (bstats.isNullAt(1)) 0L else bstats.getLong(1)
      val pairUpper = if (bstats.isNullAt(2)) 0.0 else bstats.getDouble(2)
      // stage 2: distinct candidate pairs (the CC edge set)
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4)
      val (nEdges, tEdges) = time { pairs.count() }
      // stage 3: full q47 (labels) end to end
      val (nLab, tLabels) = time {
        ConnectedComponents.labels(docs,
          "doc_id", Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4))
          .write.format("noop").mode("overwrite").save()
      }
      val path = if (nEdges <= ConnectedComponents.DefaultSmallGraphMaxEdges)
        "union-find" else "distributed-rounds"
      // star-edge (clustering) form: the shipped q47/q50 plan
      val (nStars, tStars) = time {
        Dedup.lshClusterEdges(docs, "doc_id", "text", 8, 4).count()
      }
      val (_, tLabelsStar) = time {
        ConnectedComponents.labels(docs,
          "doc_id", Dedup.lshClusterEdges(docs, "doc_id", "text", 8, 4))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[cc $d] docs=$nDocs buckets>1=$nBuckets maxBucket=$maxBucket " +
        f"pairUpperBound=$pairUpper edges=$nEdges path=$path " +
        f"tBuckets=$tBuckets%.2f tEdges=$tEdges%.2f tLabelsE2E=$tLabels%.2f " +
        f"starEdges=$nStars tStarEdges=$tStars%.2f tLabelsStarE2E=$tLabelsStar%.2f")
    }
    spark.stop()
  }
}
