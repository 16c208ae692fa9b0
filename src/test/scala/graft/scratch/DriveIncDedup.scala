package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IncrementalDedup store-growth adjudication (r10 verdict task #2):
  * ingest a corpus with clustered duplicates as shards and print, per
  * arrival, the accumulated edge-store row count for BOTH modes — the
  * shipped star-edge store and the `storePairs = true` all-pairs
  * store — plus the per-arrival ingest wall time and the final
  * keptIds equivalence. Shows the star store growing ∝ corpus across
  * arrivals where the all-pairs store inherits the
  * quadratic-in-cluster-size curve (near-dup clusters grow with SF on
  * this corpus: 99× edges for 10× docs at sf10, DriveCC).
  */
object DriveIncDedup {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/testdata/sf1")
    val nShards = 4
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .appName("graft-incdedup-growth").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.lake.LakeTable
    import graft.operators.{Dedup, IncrementalDedup}

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val nDocs = docs.count()
      val shards = (0 until nShards).map(i => docs.where(col("doc_id") % nShards === i))
      Seq(false, true).foreach { pairsMode =>
        val base = java.nio.file.Files.createTempDirectory("graft-incgrowth").toString
        val sig = LakeTable.forPath(spark, s"$base/sigs")
        val store = LakeTable.forPath(spark, s"$base/edges")
        var ingested = 0L
        shards.zipWithIndex.foreach { case (sh, i) =>
          val (_, tIngest) = time {
            IncrementalDedup.ingestShard(sig, store, sh, "doc_id", "text",
              storePairs = pairsMode)
          }
          ingested += sh.count()
          val stored = store.read().count()
          println(f"[incdedup $d mode=${if (pairsMode) "all-pairs" else "stars"} " +
            f"shard=${i + 1}/$nShards] ingested=$ingested storedEdges=$stored " +
            f"edgesPerDoc=${stored.toDouble / ingested}%.2f tIngest=$tIngest%.1f")
        }
        if (!pairsMode) {
          // closure equivalence at the end of the star run
          val inc = IncrementalDedup.keptIds(sig, store).count()
          val full = Dedup.dedupCorpus(docs, "doc_id", "text", 8, 4).count()
          println(f"[incdedup $d] keptIds(incremental)=$inc dedupCorpus(batch)=$full " +
            f"equal=${inc == full} docs=$nDocs")
        }
      }
    }
    spark.stop()
  }
}
