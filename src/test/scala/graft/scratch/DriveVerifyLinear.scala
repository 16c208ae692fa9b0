package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Verify-stage output-linearity adjudication (r11 verdict task #2):
  * at each scale, count (a) the LSH candidate pairs, (b) the
  * thresholded verified pairs (the pair-product output q23-style
  * scoring consumers get), and (c) the spanning-forest edges the
  * clustering consumers now get — plus wall time of the end-to-end
  * verified dedup. Shows (b) growing super-linearly with corpus size
  * while (c) stays bounded by distinct doc ids.
  */
object DriveVerifyLinear {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/testdata/sf1", "/tmp/testdata/sf10")
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .appName("graft-verify-linear").master("local[32]")
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
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4)
      val (nPairs, tPairs) = time { pairs.count() }
      // pair-frame formulation only at pair counts the exploded plan
      // can hold on this host — the sf10 candidate set (31.4M pairs ×
      // gram fan-out) is exactly what the bucket-local path exists for
      val (nVerified, tVerified) =
        if (nPairs <= 2000000L) {
          val verified = Dedup.shingleOverlap(docs, "doc_id", "text",
              Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4))
            .where(col("n_inter") >= lit(0.5) * col("n_union"))
            .select(col("id_a"), col("id_b"))
          time { verified.count() }
        } else (-1L, Double.NaN)
      val (nEdges, tEdges) = time {
        Dedup.lshVerifiedClusterEdges(docs, "doc_id", "text", 8, 4, 0.5).count()
      }
      val (nKept, tE2E) = time {
        Dedup.dedupCorpusVerified(docs, "doc_id", "text", 8, 4, 0.5).count()
      }
      println(f"[verifylin $d] docs=$nDocs candPairs=$nPairs (${tPairs}%.1f s) " +
        f"verifiedPairs(pairPlan)=$nVerified (${tVerified}%.1f s) " +
        f"bucketLocalEdges=$nEdges (${tEdges}%.1f s) " +
        f"edgesPerDoc=${nEdges.toDouble / nDocs}%.3f " +
        f"keptE2E=$nKept (${tE2E}%.1f s)")
    }
    spark.stop()
  }
}
