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
          // the full-CC per-arrival cost the OLD dedupShard paid: one
          // transitive closure over the whole accumulated edge store
          val (_, tKeptFull) =
            if (pairsMode) (0L, Double.NaN)
            else time { IncrementalDedup.keptIds(sig, store).count() }
          ingested += sh.count()
          val stored = store.read().count()
          println(f"[incdedup $d mode=${if (pairsMode) "all-pairs" else "stars"} " +
            f"shard=${i + 1}/$nShards] ingested=$ingested storedEdges=$stored " +
            f"edgesPerDoc=${stored.toDouble / ingested}%.2f tIngest=$tIngest%.1f" +
            (if (pairsMode) "" else f" tKeptFullCC=$tKeptFull%.1f"))
        }
        if (!pairsMode) {
          // closure equivalence at the end of the star run
          val inc = IncrementalDedup.keptIds(sig, store).count()
          val full = Dedup.dedupCorpus(docs, "doc_id", "text", 8, 4).count()
          println(f"[incdedup $d] keptIds(incremental)=$inc dedupCorpus(batch)=$full " +
            f"equal=${inc == full} docs=$nDocs")
        }
      }
      // VERIFIED standing pipeline (dedupShardVerified): per arrival,
      // gram-set commit + bucket-local verification of the touched
      // buckets + label upsert — the full exact-Jaccard pipeline
      locally {
        val base = java.nio.file.Files.createTempDirectory("graft-incver").toString
        val sig = LakeTable.forPath(spark, s"$base/sigs")
        val gram = LakeTable.forPath(spark, s"$base/grams")
        val edge = LakeTable.forPath(spark, s"$base/edges")
        val labels = LakeTable.forPath(spark, s"$base/labels")
        var ingested = 0L
        shards.zipWithIndex.foreach { case (sh, i) =>
          val (_, tArrival) = time {
            IncrementalDedup.ingestShardVerified(
              sig, gram, edge, labels, sh, "doc_id", "text", minJaccard = 0.5)
          }
          val (nKept, tKept) = time { IncrementalDedup.labeledKeptIds(labels).count() }
          ingested += sh.count()
          val stored = edge.read().count()
          println(f"[incdedup $d mode=verified shard=${i + 1}/$nShards] " +
            f"ingested=$ingested verifiedEdges=$stored kept=$nKept " +
            f"tArrival=$tArrival%.1f tKept=$tKept%.1f")
        }
        val viaLabels = IncrementalDedup.labeledKeptIds(labels).count()
        val batch = Dedup.dedupCorpusVerified(docs, "doc_id", "text", 8, 4, 0.5).count()
        println(f"[incdedup $d mode=verified] labeledKeptIds=$viaLabels " +
          f"batchVerified=$batch equal=${viaLabels == batch}")
      }
      // LABELED standing pipeline (what dedupShard now runs): per
      // arrival, quotient-CC over the shard's neighborhood + a label
      // upsert + the metadata-cheap labeledKeptIds filter — the
      // per-arrival cost must stay FLAT across arrivals where
      // tKeptFullCC above grows with the accumulated store
      locally {
        val base = java.nio.file.Files.createTempDirectory("graft-inclabeled").toString
        val sig = LakeTable.forPath(spark, s"$base/sigs")
        val store = LakeTable.forPath(spark, s"$base/edges")
        val labels = LakeTable.forPath(spark, s"$base/labels")
        var ingested = 0L
        shards.zipWithIndex.foreach { case (sh, i) =>
          val (_, tArrival) = time {
            IncrementalDedup.ingestShardLabeled(
              sig, store, labels, sh, "doc_id", "text")
          }
          val (nKept, tKept) = time { IncrementalDedup.labeledKeptIds(labels).count() }
          ingested += sh.count()
          println(f"[incdedup $d mode=labeled shard=${i + 1}/$nShards] " +
            f"ingested=$ingested kept=$nKept tArrival=$tArrival%.1f tKept=$tKept%.1f")
        }
        val viaLabels = IncrementalDedup.labeledKeptIds(labels).count()
        val viaFullCC = IncrementalDedup.keptIds(sig, store).count()
        println(f"[incdedup $d mode=labeled] labeledKeptIds=$viaLabels " +
          f"keptIds(fullCC)=$viaFullCC equal=${viaLabels == viaFullCC}")
      }
    }
    spark.stop()
  }
}
