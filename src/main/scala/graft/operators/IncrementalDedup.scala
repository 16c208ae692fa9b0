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
  *  - an edge store `(id_a, id_b)`: CONNECTIVITY edges — per-band-
  *    bucket min-id stars ([[incrementalClusterEdges]]), not all
  *    candidate pairs. Near-dup cluster size grows with corpus size
  *    (measured: all-pairs edges grew 99× for 10× docs at sf10,
  *    DriveCC), so a durable all-pairs store inherits that quadratic
  *    curve; the star store grows ≤ 2·bands rows per ingested doc —
  *    LINEAR in corpus size — while its transitive closure stays
  *    exactly `labels(bandingPairs(signatures of the union))`, the
  *    contract every consumer here ([[keptIds]], [[labeledKeptIds]])
  *    actually needs. Callers for whom the PAIRS are the product
  *    (pair-level verification scoring) opt into the all-pairs store
  *    with `storePairs = true` and pay its growth knowingly.
  *
  * Per shard, [[ingestShard]]:
  *  1. computes minhash signatures of the SHARD text only (map-side
  *     kernel, the single text scan that shard will ever get);
  *  2. appends them to the signature store — one atomic lake commit;
  *  3. re-reads exactly those rows back through the store's CDC
  *     `changes()` (only the files the commit appended — the
  *     incremental transport, not a table rescan);
  *  4. bucket-joins the shard's band buckets against the FULL store's
  *     buckets and appends the new connectivity edges (or, under
  *     `storePairs`, the normalized all-pairs candidates).
  *
  * Connectivity invariant (induction over arrivals): after every
  * shard, all ids sharing a band bucket are in one component of the
  * edge store. Each arrival connects the bucket's NEW ids to the
  * bucket's current global min id, and — when that min is itself new —
  * bridges it to the bucket's pre-existing members (one edge to the
  * old min), which were already mutually connected by their own
  * arrival rounds. Hence components over the edge store ≡ components
  * over `bandingPairs(union)` after any sequence of shards — which
  * makes [[keptIds]] (min-id representative per connected component)
  * IDENTICAL to a from-scratch [[Dedup.dedupCorpus]] over the
  * concatenated corpus. OperatorSpec proves the closure equivalence on
  * a sharded corpus, the linear-growth bound, the `storePairs`
  * all-pairs contract, and that `changes()` is the only transport.
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
    * connectivity edges it introduces (one commit; all candidate pairs
    * instead iff `storePairs`). Returns the signature store version of
    * the shard's commit — the `changes()` cursor a resuming pipeline
    * persists.
    */
  def ingestShard(
      sigStore: LakeTable,
      pairStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      storePairs: Boolean = false): Long = {
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
    val edges =
      if (storePairs)
        // pairs ARE the product: full candidate set, quadratic in
        // cluster size — every pair of the union discovered exactly
        // once, in the arrival round of its LATER document
        newBuckets.as("n")
          .join(allBuckets.as("a"), "bucket")
          .where(col("n.id") =!= col("a.id"))
          .select(
            least(col("n.id"), col("a.id")).as("id_a"),
            greatest(col("n.id"), col("a.id")).as("id_b"))
          .distinct()
      else
        incrementalClusterEdges(newBuckets, allBuckets,
          newSigs.select(col("id")))
    pairStore.write(edges, if (pairStore.exists) "append" else "error")
    v
  }

  /** The incremental counterpart of [[Dedup.lshClusterEdges]]: the
    * connectivity edges ONE shard arrival adds so that every band
    * bucket of the accumulated store stays internally connected.
    *
    * Per bucket the shard touches: connect each NEW id to the bucket's
    * current global min id (`rep`), plus — only when `rep` is itself
    * new — one bridge edge from `rep` to the bucket's pre-existing min
    * (the old members are already mutually connected by their own
    * arrival rounds, so one bridge re-roots the whole old component).
    * Emits ≤ (|shard| + touched buckets) × bands edges — every edge
    * has a this-shard endpoint, so arrivals never re-emit edges and
    * the accumulated store grows LINEARLY in corpus size. Transitive
    * closure over the accumulated edges ≡ closure over
    * `bandingPairs(union)` (OperatorSpec pins it per arrival).
    *
    * `newBuckets`/`allBuckets` are [[Dedup.bandBuckets]] frames of the
    * shard resp. the full store (including the shard); `newIds` the
    * shard's ids (column `id`). Only buckets the shard touches are
    * aggregated — the semi join prunes the store scan before the
    * groupBy, so per-arrival work is bounded by the shard's bucket
    * NEIGHBORHOOD, not store size.
    */
  def incrementalClusterEdges(
      newBuckets: DataFrame,
      allBuckets: DataFrame,
      newIds: DataFrame): DataFrame = {
    val touched = newBuckets.select("bucket").distinct()
    val reps = allBuckets.join(touched, Seq("bucket"), "left_semi")
      .join(newIds.select(col("id")).withColumn("_new", lit(true)),
        Seq("id"), "left")
      .groupBy("bucket")
      .agg(min(col("id")).as("rep"),
        min(when(col("_new").isNull, col("id"))).as("old_min"))
    // targets: the shard's ids per bucket, plus the old-min bridge
    // (a no-op whenever rep is old: then rep == old_min, self-excluded)
    val targets = newBuckets.select(col("bucket"), col("id"))
      .unionByName(reps.where(col("old_min").isNotNull)
        .select(col("bucket"), col("old_min").as("id")))
    targets.join(reps.select(col("bucket"), col("rep")), Seq("bucket"))
      .where(col("id") =!= col("rep"))
      .select(least(col("id"), col("rep")).as("id_a"),
        greatest(col("id"), col("rep")).as("id_b"))
      .distinct()
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

  /** Incremental connected-components labels: [[ingestShard]] plus a
    * persisted LABEL STORE `(id, component)` — component = min id of
    * the near-dup component, exactly [[ConnectedComponents.labels]]'
    * contract — maintained per shard WITHOUT re-running CC over the
    * ever-growing pair store ([[keptIds]]' cost profile: correct, but
    * a daily pipeline re-pays the full closure on every arrival).
    *
    * The incremental step is a QUOTIENT-GRAPH contraction. Every
    * stored component is internally connected, so for connectivity it
    * collapses to its representative; and because the representative
    * IS the component minimum, the min-label of a merged component
    * over the full graph equals the min over (old reps ∪ new ids) —
    * the quotient answer is exact, not an approximation. Per shard:
    *  1. map the shard's new pairs' endpoints through the store
    *     (labeled id → its rep; unseen id → itself);
    *  2. run CC on that quotient graph — |new pairs| edges over
    *     (reps touched by this shard ∪ new ids) vertices, i.e. work
    *     bounded by the shard's component NEIGHBORHOOD, never corpus
    *     size. An unbounded cascade (one shard bridging many old
    *     components) is still just this CC — its cost scales with the
    *     number of affected components, which is what "cascade" means;
    *  3. upsert the store: members of re-labeled components get the
    *     new rep (a key-scattered standing upsert — the label store is
    *     created `merge-on-read`, so each shard writes O(changed
    *     labels), not a store rewrite), new ids insert.
    *
    * OperatorSpec pins shard-incremental labels ≡ one-shot
    * [[ConnectedComponents.labels]] over the full pair store.
    */
  def ingestShardLabeled(
      sigStore: LakeTable,
      pairStore: LakeTable,
      labelStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      storePairs: Boolean = false): Long = {
    val pairsBefore = if (pairStore.exists) pairStore.version else -1L
    val v = ingestShard(sigStore, pairStore, shard, idCol, textCol, k, bands,
      storePairs)
    val newPairs = pairStore.changes(pairsBefore)
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
    val newIds = shard.select(col(idCol).cast("long").as("id")).distinct()
    updateLabels(labelStore, newPairs, newIds)
    v
  }

  /** The label-store maintenance step shared by [[ingestShardLabeled]]
    * and [[ingestShardVerified]]: fold ONE arrival's new edges into the
    * persisted `(id, component)` store via the quotient-graph
    * contraction described on ingestShardLabeled.
    */
  private def updateLabels(
      labelStore: LakeTable, newPairs: DataFrame, newIds: DataFrame): Unit = {
    val labels =
      if (labelStore.exists) labelStore.read()
      else newIds.sparkSession.createDataFrame(
        newIds.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("component",
            org.apache.spark.sql.types.LongType, nullable = false))))

    // endpoints through the store: labeled → rep, unseen → self
    val qEdges = newPairs
      .join(labels.select(col("id").as("id_a"), col("component").as("ca")), Seq("id_a"), "left")
      .join(labels.select(col("id").as("id_b"), col("component").as("cb")), Seq("id_b"), "left")
      .select(
        coalesce(col("ca"), col("id_a")).as("u"),
        coalesce(col("cb"), col("id_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val qVerts = qEdges.select(col("u").as("id"))
      .unionByName(qEdges.select(col("v").as("id")))
      .unionByName(newIds)
      .distinct()
    val qLabels = ConnectedComponents.labels(qVerts, "id", qEdges)

    // nodes whose label moved: old reps absorbed into a smaller-min
    // component, and new ids that are not their own component
    val delta = qLabels.where(col("id") =!= col("component"))
    val repRemap = delta
      .select(col("id").as("component"), col("component").as("newComp"))
    // members of re-labeled OLD components (bounded by affected
    // component sizes); the rep's own row re-labels through the same join
    val updatedOld = labels.join(repRemap, Seq("component"))
      .select(col("id"), col("newComp").as("component"))
    val newRows = newIds
      .join(qLabels.withColumnRenamed("component", "qc"), Seq("id"), "left")
      .select(col("id"), coalesce(col("qc"), col("id")).as("component"))
    val upsert = updatedOld.unionByName(newRows)
    if (!labelStore.exists) {
      labelStore.write(upsert, "error")
      // standing scattered-key upserts: merge-on-read from day one
      labelStore.alterSetProperties(Map("graft.merge.mode" -> "merge-on-read"))
    } else labelStore.merge(upsert, Seq("id"))
  }

  /** Kept ids straight off the incrementally-maintained label store —
    * a metadata-cheap filter, no connected-components run at all.
    */
  def labeledKeptIds(labelStore: LakeTable): DataFrame =
    labelStore.read().where(col("id") === col("component")).select(col("id"))

  /** Shard-incremental VERIFIED near-dup detection — [[ingestShard]]'s
    * candidate connectivity replaced by exact shingle-Jaccard
    * verification at `minJaccard` (the incremental counterpart of
    * [[Dedup.dedupCorpusVerified]]). One more lake table carries the
    * verification-side state:
    *  - `gramStore` `(id, elems: array<long>)`: each doc's DISTINCT
    *    60-bit gram hashes, sorted once at arrival — ~8 B per distinct
    *    gram, so the text is scanned exactly once, on arrival, and
    *    never again;
    *  - `edgeStore` accumulates VERIFIED edges (pairs that passed the
    *    Jaccard gate), ≤ bucket−1 per touched bucket per arrival;
    *  - `labelStore` is maintained by the same quotient contraction as
    *    [[ingestShardLabeled]].
    *
    * Per arrival, verification runs BUCKET-LOCALLY
    * ([[Dedup.lshVerifiedClusterEdges]]'s kernel) over the buckets the
    * shard touches, restricted to pairs WITH A NEW ENDPOINT: an
    * old-old candidate pair was already checked in its later doc's
    * arrival round, so every candidate pair of the accumulated corpus
    * is verified exactly once across the shard sequence. The local
    * union-find's skip-if-connected applies within an arrival
    * (closure-safe: an edge inside one component never changes the
    * closure), and the closure of the accumulated edge store equals
    * the closure of ALL thresholded candidate pairs of the union —
    * [[dedupShardVerified]]'s output is spec-pinned identical to a
    * from-scratch `dedupCorpusVerified` over the concatenated corpus
    * after every arrival. Per-arrival cost is bounded by the shard's
    * bucket neighborhood (members × grams of touched buckets), never
    * corpus size.
    */
  def ingestShardVerified(
      sigStore: LakeTable,
      gramStore: LakeTable,
      edgeStore: LakeTable,
      labelStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      minJaccard: Double = 0.5): Long = {
    val spark = shard.sparkSession
    import spark.implicits._
    val before = if (sigStore.exists) sigStore.version else -1L
    val sigs = Dedup.minhashSignatures(shard, idCol, textCol, k)
    sigStore.write(sigs, if (before < 0L) "error" else "append")
    val v = sigStore.version
    gramStore.write(shardGramSets(shard, idCol, textCol),
      if (gramStore.exists) "append" else "error")

    // CDC transport, exactly as ingestShard: the shard's signatures
    // come back off the lake without touching the rest of the store
    val newSigs = sigStore.changes(before, v).drop("_commit_version")
    val edges = verifiedArrivalEdges(
      newSigs, sigStore.read(), gramStore.read(), k, bands, minJaccard)
    val edgesBefore = if (edgeStore.exists) edgeStore.version else -1L
    edgeStore.write(edges, if (edgesBefore < 0L) "error" else "append")
    val newEdges = edgeStore.changes(edgesBefore)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
    updateLabels(labelStore,
      newEdges, shard.select(col(idCol).cast("long").as("id")).distinct())
    v
  }

  /** The verified edges ONE arrival adds (the kernel behind
    * [[ingestShardVerified]] and the streaming front end): bucket-local
    * verification of the buckets `newSigs` touches, restricted to
    * pairs with a new endpoint — see ingestShardVerified's scaladoc for
    * the exactly-once-per-pair and closure arguments. `allSigs` /
    * `allGrams` are the signature and gram stores INCLUDING this
    * arrival (streaming callers pass version-pinned reads so replays
    * are bit-identical).
    */
  def verifiedArrivalEdges(
      newSigs: DataFrame,
      allSigs: DataFrame,
      allGrams: DataFrame,
      k: Int,
      bands: Int,
      minJaccard: Double): DataFrame = {
    val spark = newSigs.sparkSession
    import spark.implicits._
    val newBuckets = Dedup.bandBuckets(newSigs, k, bands)
    val allBuckets = Dedup.bandBuckets(allSigs, k, bands)
    val touched = newBuckets.select("bucket").distinct()
    val newIds = newSigs.select(col("id"))
    val members = allBuckets.join(touched, Seq("bucket"), "left_semi")
      .join(allGrams, Seq("id"))
      .join(newIds.withColumn("_new", lit(true)), Seq("id"), "left")
      .select(col("bucket"), col("id"), col("elems"),
        coalesce(col("_new"), lit(false)).as("is_new"))
      .as[(Long, Long, Array[Long], Boolean)]
    members.groupByKey(_._1)
      .flatMapGroups { (bucket: Long, it: Iterator[(Long, Long, Array[Long], Boolean)]) =>
        val ms = it.map(m => (m._2, m._3, m._4)).toArray
        if (ms.length > Dedup.VerifiedBucketMaxIds)
          throw new IllegalStateException(
            s"LSH bucket exceeds ${Dedup.VerifiedBucketMaxIds} ids (bucket " +
              s"$bucket, ${ms.length} ids) for bucket-local verification — " +
              "run exact dedup first to collapse degenerate boilerplate")
        scala.util.Sorting.quickSort(ms)(Ordering.by(_._1))
        val n = ms.length
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var i = 0
        while (i < n - 1) {
          var j = i + 1
          while (j < n) {
            // only pairs with a NEW endpoint: old-old pairs were
            // verified in their own (later doc's) arrival round
            if (ms(i)._3 || ms(j)._3) {
              val ri = find(i); val rj = find(j)
              if (ri != rj) {
                val ea = ms(i)._2; val eb = ms(j)._2
                val ni = graft.functions.SetKernels
                  .sortedIntersectCountLongArrays(ea, eb)
                if (ni >= minJaccard * (ea.length + eb.length - ni)) {
                  if (ri < rj) parent(rj) = ri else parent(ri) = rj
                  out += ((ms(i)._1, ms(j)._1))
                }
              }
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("id_a", "id_b")
  }

  /** The sorted distinct 60-bit gram sets of one shard — the
    * verification-side state [[ingestShardVerified]] persists (shared
    * with the streaming front end).
    */
  def shardGramSets(shard: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.rebalance(
        shard.select(col(idCol).cast("long").as("id"), col(textCol).as("t")))
      .where(col("t").isNotNull)
      .select(col("id"), sort_array(
        graft.functions.TextKernelFunctions.shingleHashes(col("t"))).as("elems"))

  /** Ingest `shard` with VERIFICATION and return only its rows that
    * survive verified dedup against everything ingested so far —
    * identical after every arrival to a from-scratch
    * [[Dedup.dedupCorpusVerified]] over the concatenated corpus
    * (spec-pinned), at O(shard bucket neighborhood) per arrival.
    */
  def dedupShardVerified(
      sigStore: LakeTable,
      gramStore: LakeTable,
      edgeStore: LakeTable,
      labelStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    ingestShardVerified(sigStore, gramStore, edgeStore, labelStore, shard,
      idCol, textCol, k, bands, minJaccard)
    shard.join(
      labeledKeptIds(labelStore).withColumnRenamed("id", idCol),
      Seq(idCol), "left_semi")
  }

  /** Ingest `shard` and return only its rows that survive dedup
    * against everything ingested so far (including the shard itself) —
    * the per-arrival output of the standing pipeline.
    *
    * Routed through the LABEL STORE ([[ingestShardLabeled]] +
    * [[labeledKeptIds]]): per-arrival cost is bounded by the shard's
    * component NEIGHBORHOOD, not by the accumulated edge store — the
    * earlier formulation re-ran the full transitive closure
    * ([[keptIds]]) over the ever-growing store on EVERY arrival, a
    * per-day cost that grows with corpus lifetime. All arrivals must
    * flow through this method (or [[ingestShardLabeled]]) so the label
    * store stays complete; one-shot audits over stores built without
    * labels use [[ingestShard]] + [[keptIds]] directly.
    */
  def dedupShard(
      sigStore: LakeTable,
      pairStore: LakeTable,
      labelStore: LakeTable,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
      storePairs: Boolean = false): DataFrame = {
    ingestShardLabeled(sigStore, pairStore, labelStore, shard, idCol, textCol,
      k, bands, storePairs)
    shard.join(
      labeledKeptIds(labelStore).withColumnRenamed("id", idCol),
      Seq(idCol), "left_semi")
  }
}
