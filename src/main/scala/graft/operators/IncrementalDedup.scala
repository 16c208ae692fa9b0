package graft.operators

import graft.lake.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard-incremental near-duplicate detection — the operator a
  * STANDING 100 TB training-data pipeline actually runs: new document
  * shards arrive daily and must be deduplicated against everything
  * ingested before WITHOUT rescanning the corpus text.
  *
  * Two lake tables carry all accumulated state:
  *  - a signature store `(id, mh0..mh{k-1})`: one row per document
  *    ever ingested. ~k·8 bytes per doc — at 100 TB of text (~3 KB/doc
  *    average) the store is ~0.25% of corpus bytes, so scanning IT is
  *    cheap while the text is scanned exactly once, on arrival;
  *  - a pair store `(id_a, id_b)`: every LSH candidate pair discovered
  *    so far (bounded by near-dup density, far smaller than the store).
  *
  * Per shard, [[ingestShard]]:
  *  1. computes minhash signatures of the SHARD text only (map-side
  *     kernel, the single text scan that shard will ever get);
  *  2. appends them to the signature store — one atomic lake commit;
  *  3. re-reads exactly those rows back through the store's CDC
  *     `changes()` (only the files the commit appended — the
  *     incremental transport, not a table rescan);
  *  4. bucket-joins the shard's band buckets against the FULL store's
  *     buckets and appends the (normalized, deduplicated) new pairs.
  *
  * Every candidate pair of the union corpus is discovered exactly
  * once — in the arrival round of its LATER document, where one side
  * is new and the other is already in the store (a within-shard pair
  * emits from both join sides and collapses under the normalize +
  * distinct). So after any sequence of shards, the pair store holds
  * precisely `bandingPairs(signatures of the union)` — which makes
  * [[keptIds]] (min-id representative per connected component over the
  * pair store) IDENTICAL to a from-scratch [[Dedup.dedupCorpus]] over
  * the concatenated corpus. OperatorSpec proves the equivalence on a
  * sharded corpus and that `changes()` is the only transport.
  *
  * Contract: document ids are globally unique across shards (same
  * contract as [[Dedup.minhashSignatures]]); re-ingesting an id is
  * undefined (dedup the shard stream first).
  *
  * No reference analog (the reference writes tables; it has no dedup);
  * extension tier per SURVEY §7.5.
  */
object IncrementalDedup {

  /** Ingest one shard: append its signatures (one commit) and the new
    * candidate pairs it introduces (one commit). Returns the signature
    * store version of the shard's commit — the `changes()` cursor a
    * resuming pipeline persists.
    */
  def ingestShard(
      sigStore: LakeTable,
      pairStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4): Long = {
    val before = if (sigStore.exists) sigStore.version else -1L
    val sigs = Dedup.minhashSignatures(shard, idCol, textCol, k)
    sigStore.write(sigs, if (before < 0L) "error" else "append")
    val v = sigStore.version

    // CDC re-read: ONLY the files this commit appended. This is the
    // point of the design — the shard's signatures come back off the
    // lake (exactly-once, restart-safe) without touching the rest of
    // the store's data files, and the corpus text not at all.
    val newSigs = sigStore.changes(before, v).drop("_commit_version")
    val newBuckets = Dedup.bandBuckets(newSigs, k, bands)
    val allBuckets = Dedup.bandBuckets(sigStore.read(), k, bands)
    val pairs = newBuckets.as("n")
      .join(allBuckets.as("a"), "bucket")
      .where(col("n.id") =!= col("a.id"))
      .select(
        least(col("n.id"), col("a.id")).as("id_a"),
        greatest(col("n.id"), col("a.id")).as("id_b"))
      .distinct()
    pairStore.write(pairs, if (pairStore.exists) "append" else "error")
    v
  }

  /** Ids the full-corpus dedup would KEEP (min-id representative per
    * near-dup component), computed from the stores alone — no text.
    */
  def keptIds(sigStore: LakeTable, pairStore: LakeTable): DataFrame = {
    val ids = sigStore.read().select("id")
    val pairs = pairStore.read().select("id_a", "id_b")
    ConnectedComponents.labels(ids, "id", pairs)
      .where(col("id") === col("component"))
      .select(col("id"))
  }

  /** Ingest `shard` and return only its rows that survive dedup
    * against everything ingested so far (including the shard itself) —
    * the per-arrival output of the standing pipeline.
    */
  def dedupShard(
      sigStore: LakeTable,
      pairStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4): DataFrame = {
    ingestShard(sigStore, pairStore, shard, idCol, textCol, k, bands)
    shard.join(
      keptIds(sigStore, pairStore).withColumnRenamed("id", idCol),
      Seq(idCol), "left_semi")
  }
}
