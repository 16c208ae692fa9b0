package graft.streaming

import java.nio.file.Path

import graft.lake.LakeTable
import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Structured-Streaming front end of [[graft.operators.IncrementalDedup]]:
  * a standing ingest where each micro-batch is a document shard that
  * must be near-dup-deduplicated against everything ingested before,
  * without rescanning the corpus.
  *
  * Three lake tables carry all state — the minhash signature store,
  * the LSH connectivity-edge store (per-bucket min-id stars, linear
  * growth; see [[graft.operators.IncrementalDedup]]), and the
  * deduplicated output corpus —
  * and every per-batch commit to each is stamped with the stream's
  * batch id, which makes the whole pipeline EXACTLY-ONCE under
  * checkpoint replay with no coordination beyond the stamps: a
  * replayed batch finds each already-stamped commit and skips it, a
  * partially-applied batch (crash between the signature and pair
  * commits) re-runs only the missing steps, and every recomputation
  * reads the stores AS OF the versions the first attempt produced
  * (time travel), so the redo is bit-identical. The checkpoint
  * guarantees batch N+1 is never attempted until batch N's
  * foreachBatch returned, so "latest version" never races the stamps.
  *
  * Per batch the corpus text is scanned exactly once (the signature
  * kernel); the pair discovery bucket-joins the NEW signatures —
  * re-read through the store's CDC `changes()`, touching only the
  * files the signature commit appended — against the store's band
  * buckets. Identical arithmetic to the batch operator, so
  * StreamingSpec pins: streamed shards ⇒ the same kept set as one
  * batch `Dedup.dedupCorpus` over the concatenated input.
  *
  * Output contract (the standard one for streaming dedup): each
  * batch appends the rows of ITS shard that survive dedup against
  * the corpus so far. A later arrival can bridge two earlier
  * components — retroactively making an already-emitted doc a
  * duplicate — which an append-only stream cannot retract;
  * [[IncrementalDedup.keptIds]] over the same stores remains the
  * exact retroactive answer at any time.
  */
object StreamingDedup {

  private val BatchKey = "streamBatchId"

  def dedupedIngest(
      stream: DataFrame,
      sigPath: Path,
      pairPath: Path,
      outPath: Path,
      checkpointDir: String,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      queryName: String = "graft-dedup-ingest"): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, sigPath, pairPath, outPath,
          idCol, textCol, k, bands)
      }
      .start()

  /** One shard through the three stores; idempotent per (table,
    * batchId). Public so a non-streaming caller (backfill, test) can
    * drive the identical path.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      sigPath: Path,
      pairPath: Path,
      outPath: Path,
      idCol: String,
      textCol: String,
      k: Int,
      bands: Int): Unit = {
    val spark = batch.sparkSession
    val sig = new LakeTable(spark, sigPath)
    val pair = new LakeTable(spark, pairPath)
    val out = new LakeTable(spark, outPath)

    // 1. signatures: the shard text's only scan, one stamped commit
    val sigV = committedVersion(sig, batchId).getOrElse {
      val before = if (sig.exists) sig.version else -1L
      sig.write(
        Dedup.minhashSignatures(batch, idCol, textCol, k),
        if (before < 0L) "error" else "append",
        operationParams = Map(BatchKey -> batchId.toString))
      sig.version
    }

    // 2. new connectivity edges: CDC re-read of exactly the signature
    //    commit, banded against the store AS OF that commit. Star
    //    edges (IncrementalDedup.incrementalClusterEdges), not
    //    all-pairs — a standing stream's durable store must grow
    //    linearly in corpus size, and CC closure is all step 3 needs.
    val pairV = committedVersion(pair, batchId).getOrElse {
      val newSigs = sig.changes(sigV - 1, sigV).drop("_commit_version")
      val newBuckets = Dedup.bandBuckets(newSigs, k, bands)
      val allBuckets = Dedup.bandBuckets(sig.read(versionAsOf = sigV), k, bands)
      val edges = graft.operators.IncrementalDedup.incrementalClusterEdges(
        newBuckets, allBuckets, newSigs.select(col("id")))
      pair.write(edges, if (pair.exists) "append" else "error",
        operationParams = Map(BatchKey -> batchId.toString))
      pair.version
    }

    // 3. survivors of THIS shard vs the corpus so far (stores as of
    //    this batch's own commits — replay-stable)
    if (committedVersion(out, batchId).isEmpty) {
      val ids = sig.read(versionAsOf = sigV).select("id")
      val pairs = pair.read(versionAsOf = pairV).select("id_a", "id_b")
      val kept = ConnectedComponents.labels(ids, "id", pairs)
        .where(col("id") === col("component"))
        .select(col("id").as(idCol))
      val survivors = batch.join(kept, Seq(idCol), "left_semi")
      out.write(survivors, if (out.exists) "append" else "error",
        operationParams = Map(BatchKey -> batchId.toString))
    }
  }

  private def committedVersion(t: LakeTable, batchId: Long): Option[Long] =
    if (!t.exists) None
    else t.historyInfo
      .filter(_.operationParameters.get(BatchKey).contains(batchId.toString))
      .map(_.version).sorted.lastOption
}
