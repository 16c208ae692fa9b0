package graft.streaming

import java.nio.file.Path

import graft.lake.LakeTable
import graft.operators.{ConnectedComponents, Dedup, IncrementalDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Structured-Streaming front end of the VERIFIED incremental dedup
  * ([[graft.operators.IncrementalDedup.ingestShardVerified]]) — the
  * standing ingest a production pipeline runs: each micro-batch is
  * deduplicated against everything ingested before with EXACT
  * shingle-Jaccard verification of the LSH candidates, without ever
  * rescanning corpus text.
  *
  * Four lake tables carry all state — signatures, per-doc sorted gram
  * sets (the verification-side state; text is scanned exactly once,
  * on arrival), VERIFIED edges, and the deduplicated output corpus.
  * Exactly-once under checkpoint replay by the same per-table batch
  * stamps as [[StreamingDedup]]: a replayed batch finds each
  * already-stamped commit and skips it, a partially-applied batch
  * re-runs only the missing steps, and every recomputation reads the
  * stores AS OF the versions the first attempt produced, so the redo
  * is bit-identical (the bucket-local verification kernel is
  * deterministic given store contents).
  *
  * Per batch: one text scan (signatures + gram sets), then
  * bucket-local verification of the buckets the batch touches,
  * restricted to pairs with a new endpoint — every candidate pair of
  * the accumulated corpus is verified exactly once, in its later
  * doc's batch ([[IncrementalDedup.verifiedArrivalEdges]]). The
  * verified edge store grows corpus-linearly (≤ |bucket|−1 edges per
  * touched bucket per batch), so the per-batch closure over it stays
  * cheap; StreamingSpec pins streamed shards ⇒ the same kept set as
  * one batch [[Dedup.dedupCorpusVerified]] over the concatenated
  * input. Output contract as StreamingDedup: each batch appends ITS
  * shard's survivors; a later bridge cannot retract an earlier emit —
  * the edge store's closure remains the exact retroactive answer.
  */
object StreamingVerifiedDedup {

  private val BatchKey = "streamBatchId"

  def dedupedIngest(
      stream: DataFrame,
      sigPath: Path,
      gramPath: Path,
      edgePath: Path,
      outPath: Path,
      checkpointDir: String,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      minJaccard: Double = 0.5,
      queryName: String = "graft-verified-dedup-ingest"): StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, sigPath, gramPath, edgePath, outPath,
          idCol, textCol, k, bands, minJaccard)
      }
      .start()

  /** One shard through the four stores; idempotent per (table,
    * batchId). Public so a non-streaming caller (backfill, test) can
    * drive the identical path.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      sigPath: Path,
      gramPath: Path,
      edgePath: Path,
      outPath: Path,
      idCol: String,
      textCol: String,
      k: Int,
      bands: Int,
      minJaccard: Double): Unit = {
    val spark = batch.sparkSession
    val sig = new LakeTable(spark, sigPath)
    val gram = new LakeTable(spark, gramPath)
    val edge = new LakeTable(spark, edgePath)
    val out = new LakeTable(spark, outPath)

    // 1. signatures: one stamped commit off the shard's only text scan
    val sigV = committedVersion(sig, batchId).getOrElse {
      val before = if (sig.exists) sig.version else -1L
      sig.write(
        Dedup.minhashSignatures(batch, idCol, textCol, k),
        if (before < 0L) "error" else "append",
        operationParams = Map(BatchKey -> batchId.toString))
      sig.version
    }

    // 2. gram sets: the verification-side state, same scan shape
    val gramV = committedVersion(gram, batchId).getOrElse {
      gram.write(IncrementalDedup.shardGramSets(batch, idCol, textCol),
        if (gram.exists) "append" else "error",
        operationParams = Map(BatchKey -> batchId.toString))
      gram.version
    }

    // 3. verified edges: bucket-local verification of the touched
    //    buckets, new-endpoint pairs only, against version-pinned
    //    stores (replay-stable)
    val edgeV = committedVersion(edge, batchId).getOrElse {
      val newSigs = sig.changes(sigV - 1, sigV).drop("_commit_version")
      val edges = IncrementalDedup.verifiedArrivalEdges(
        newSigs,
        sig.read(versionAsOf = sigV),
        gram.read(versionAsOf = gramV),
        k, bands, minJaccard)
      edge.write(edges, if (edge.exists) "append" else "error",
        operationParams = Map(BatchKey -> batchId.toString))
      edge.version
    }

    // 4. survivors of THIS shard vs the verified closure so far
    if (committedVersion(out, batchId).isEmpty) {
      val ids = sig.read(versionAsOf = sigV).select("id")
      val edges = edge.read(versionAsOf = edgeV).select("id_a", "id_b")
      val kept = ConnectedComponents.labels(ids, "id", edges)
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
