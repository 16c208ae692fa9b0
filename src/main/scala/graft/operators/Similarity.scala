package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §7.5).
  *
  * Two plans, same contract:
  * - `bruteForceTopK`: probes × corpus with the codegen'd
  *   `graft_cosine` kernel. The probe side is broadcast (it's small by
  *   construction), so the corpus scan never shuffles — each executor
  *   streams its corpus partition past the in-memory probe set. This
  *   is the exact baseline and stays viable surprisingly far: 1k
  *   probes × 100M vectors/executor-wave is a pure compute problem.
  * - `lshTopK`: random-hyperplane LSH — vectors hash to a signature of
  *   sign-bits against `planes` deterministic hyperplanes; candidates
  *   are corpus rows sharing a probe's bucket, then exact-rank within
  *   candidates. Recall < 1 by design; the bucket join replaces the
  *   full cross product, which is the 100 TB path.
  *
  * Hyperplanes are derived from md5 so runs are reproducible without a
  * seed exchange (and oracle-replayable in principle).
  */
object Similarity {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Similarity")

  /** round(cosine, 6) — ranking key. Rounding makes cross-engine
    * comparison stable; ties break on id.
    */
  private def score(df: DataFrame, a: Column, b: Column): Column =
    round(VectorFunctions.cosine(df.sparkSession, a, b), 6)

  /** The same score from PRE-COMPUTED per-side norms: bit-identical to
    * `score` (graft_cosine computes `dot/(sqrt(nx)*sqrt(ny))` with the
    * zero-denominator guard replicated here; graft_norm2 IS sqrt(nx)
    * with the same accumulation order), but the per-PAIR loop is dot
    * alone — one third of the cosine kernel's arithmetic, with each
    * row's norm amortized over every pair it joins into. On a probes ×
    * corpus scorer that is the difference between 3 and 1 passes over
    * every vector element ever paired.
    *
    * PRECONDITION — uniform embedding dimension. The fused cosine
    * kernel accumulates BOTH norms over min(len_a, len_b), while
    * graft_norm2 (and ProbeTopKAgg's per-side norms) cover each side's
    * FULL length; the two agree exactly iff every paired vector has
    * the same dimension, which an embedding column has by
    * construction. On mixed-dimension rows the split form scores with
    * full-length norms (the mathematically saner choice) and the
    * bit-identity claim does not apply.
    */
  private def splitScore(
      spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    round(when(denom === 0.0, 0.0)
      .otherwise(VectorFunctions.dot(spark, a, b) / denom), 6)
  }

  /** Per-probe (rank, cand_id, sim) for the k best candidates of a
    * scored frame, via the mergeable bounded-top-k aggregate
    * (TopKFunctions scaladoc). The window formulation
    * (`row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC,
    * cand_id)`) is semantically identical on non-null scores (the
    * aggregate DROPS null-scored rows where the window ranks them
    * last — no null sims arise here: splitScore/graft_cosine are
    * null only on null inputs, which the joins never pair) but
    * shuffles EVERY scored row — probes × corpus, the cross product these operators never
    * materialize elsewhere; the aggregate partial-reduces each map
    * task to k rows per probe, so the exchange is corpus-size-free.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    scored.groupBy("probe_id")
      .agg(graft.functions.TopKFunctions
        .topK(spark, col("sim"), col("cand_id"), k).as("tk"))
      .select(col("probe_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      // probe_id cast long: the embedded kernels emit BIGINT ids, so
      // every regime must (the output schema is part of the contract
      // and may not change when data size tips the regime)
      .select(col("probe_id").cast("long").as("probe_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
  }

  /** How an over-gate ANN call will execute, decided by BOUNDED
    * driver work (see [[decideRegime]]).
    */
  private[graft] sealed trait AnnRegime
  private[graft] object AnnRegime {
    /** the probe side fits the collect cap: embedded (≤ gate rows) or
      * chunked kernels
      */
    final case class Probes(rows: Array[org.apache.spark.sql.Row]) extends AnnRegime
    /** probes exceed the cap but the corpus fits: role swap */
    final case class Corpus(rows: Array[org.apache.spark.sql.Row]) extends AnnRegime
    /** both sides exceed the cap (or the kernels are disabled) */
    case object BothOver extends AnnRegime
  }

  /** What [[decideRegime]] decided, plus the bounds it decided WITH —
    * callers chunk by `chunkRows` (the byte-shrunk effective gate, so
    * each chunk's embedded literal matrix respects the byte budget
    * too) and report `effectiveCap` in the fail-fast message (the cap
    * the data actually exceeded, which the byte budget may have set
    * well below the row cap the caller passed). `fetched` counts rows
    * driver-transferred (the spec hook for the transfer bound); `dims`
    * is the sniffed embedding dimension (reused by the LSH join
    * regime's signature expression instead of a second sizing job).
    */
  private[graft] final case class RegimeDecision(
      regime: AnnRegime,
      fetched: Long,
      chunkRows: Int,
      effectiveCap: Long,
      dims: Option[Int])

  /** Regime decision + matrix collect for the kernel ANN operators,
    * with BOUNDED driver transfer on every path:
    *
    *  1. sniff the embedding dimension from ONE non-null probe vector
    *     (a `head(1)` job — the only job the decision adds to the
    *     kernel-enabled path) and shrink the EFFECTIVE gate to
    *     `min(maxEmbeddedProbes, maxCollectBytes / (8·dims))` BEFORE
    *     any matrix moves: the gate prefix itself is rows × dims × 8
    *     bytes of driver transfer, so a dims-blind gate of 2¹⁶ rows
    *     means ~2.1 GB at 4096-dim embeddings — the r16 shape
    *     byte-budgeted only the over-gate cap and never the gate
    *     collect it paid first. The shrunk gate also bounds each
    *     chunk's embedded literal matrix (gate × dims × 8 bytes of
    *     plan shipped per executor), since callers chunk by it.
    *  2. collect `limit(gate + 1)` probe rows — ≤ gate means EMBEDDED
    *     and the prefix IS the matrix.
    *  3. otherwise COUNT the probe side against the effective cap —
    *     `min(max(maxChunkedProbes, gate), maxCollectBytes/(8·dims))`
    *     (`limit(cap + 1).count()`, a bounded job transferring one
    *     long, NOT a matrix) — and collect the full probe matrix only
    *     when it fits → CHUNKED.
    *  4. else count the corpus the same way and collect IT when it
    *     fits → ROLE SWAP. Only the gate prefix is live during this
    *     collect — the r15 shape held a full cap-sized probe matrix
    *     while collecting the corpus, transiently doubling the bound.
    *  5. both over → [[AnnRegime.BothOver]], having driver-transferred
    *     O(gate) rows + two counts to find out (the r15 shape paid up
    *     to TWO full cap-sized collects to discover the fallback).
    *
    * The byte budget sizes BOTH sides with the sniffed probe dims
    * (uniform embedding dimension is already splitScore's scoring
    * precondition). A budget below one row's bytes floors at 1 row —
    * the cap then routes over-gate calls to role swap / fail-fast
    * rather than collecting a matrix over budget.
    */
  private[graft] def decideRegime(
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      corpus: Option[(DataFrame, String, String)],
      maxEmbeddedProbes: Int, maxChunkedProbes: Int,
      maxCollectBytes: Long,
      knownDims: Option[Int] = None): RegimeDecision = {
    // clamped vs Int overflow when a caller passes Int.MaxValue (the
    // fail-fast message explicitly invites raising the caps)
    val rawGate = math.min(math.max(maxEmbeddedProbes, 0), Int.MaxValue - 1)
    if (rawGate == 0) return RegimeDecision(AnnRegime.BothOver, 0L, 0, 0L, None)
    val pSel = probes.select(
      col(probeIdCol).cast("long"), col(probeVecCol).cast("array<double>"))
    // `knownDims` (r18): a caller whose embedding width is STATICALLY
    // known (a model's fixed dimension) skips the one-row sniff job —
    // the only Spark job the decision otherwise adds per call. The
    // value feeds exactly what the sniff fed (the byte-budget row
    // caps); regimes are spec-pinned result-equal, so a consistent
    // width yields the identical decision, and the transfer bound
    // (`fetched`) only ever shrinks by the skipped row.
    val dims = knownDims.filter(_ > 0).orElse {
      probes
        .select(col(probeVecCol).cast("array<double>").as("__v"))
        .where(col("__v").isNotNull && size(col("__v")) > 0)
        .select(size(col("__v"))).head(1).headOption.map(_.getInt(0))
    }
    var fetched =
      if (knownDims.exists(_ > 0)) 0L else dims.size.toLong
    val byteCapRows = dims.map(d => math.max(1L, maxCollectBytes / (8L * d)))
      .getOrElse(Long.MaxValue) // no non-null probe vector: row caps govern
    val gate = math.min(rawGate.toLong, byteCapRows).toInt
    val head = pSel.limit(gate + 1).collect()
    fetched += head.length
    if (head.length <= gate)
      return RegimeDecision(AnnRegime.Probes(head), fetched, gate, gate, dims)
    // byteCapRows ≥ gate by construction of gate, so cap ≥ gate too
    val cap = math.min(math.max(maxChunkedProbes.toLong, gate.toLong), byteCapRows)
      .min(Int.MaxValue - 1L).toInt
    val pCount = pSel.limit(cap + 1).count()
    fetched += 1
    if (pCount <= cap) {
      val all = pSel.limit(cap).collect()
      return RegimeDecision(
        AnnRegime.Probes(all), fetched + all.length, gate, cap, dims)
    }
    corpus match {
      case Some((c, cIdCol, cVecCol)) =>
        val cSel = c.select(
          col(cIdCol).cast("long"), col(cVecCol).cast("array<double>"))
        val cCount = cSel.limit(cap + 1).count()
        fetched += 1
        if (cCount <= cap) {
          val all = cSel.limit(cap).collect()
          RegimeDecision(
            AnnRegime.Corpus(all), fetched + all.length, gate, cap, dims)
        } else RegimeDecision(AnnRegime.BothOver, fetched, gate, cap, dims)
      case None => RegimeDecision(AnnRegime.BothOver, fetched, gate, cap, dims)
    }
  }

  /** Session conf: set true to let the exact operators submit the
    * non-equi join when BOTH sides exceed the collect cap, instead of
    * failing fast (the join plans as CartesianProduct above broadcast
    * size — measured disk-bound at sf10, BENCHNOTES_r14).
    */
  val AnnForceJoinKey = "spark.graft.ann.forceJoin"

  /** Both sides over the cap with kernels enabled: the engine does NOT
    * silently submit a plan its own measurements called dead — fail
    * fast with the scale alternatives, unless the caller explicitly
    * opts into the join via [[AnnForceJoinKey]] (then warn). A gate of
    * 0 never reaches here (kernels deliberately disabled = the spec
    * seam; the join runs silently). `cap` is the EFFECTIVE cap the
    * decision used — when the byte budget governed, that is smaller
    * than the row cap the caller passed, and the message must name the
    * bound the data actually exceeded.
    */
  private[graft] def enforceJoinContract(
      spark: org.apache.spark.sql.SparkSession, op: String, cap: Long): Unit = {
    val msg = s"$op: BOTH probe and corpus side exceed the collect cap " +
      s"(maxChunkedProbes/maxCollectBytes, effective $cap rows) — the " +
      "exact non-equi join plans as CartesianProduct above broadcast " +
      "size and was measured disk-bound at scale (BENCHNOTES_r14). " +
      "Use lshTopKFrames/ivfTopKFrames (bucket equi-joins) at this " +
      s"scale, raise the caps, or set $AnnForceJoinKey=true to submit " +
      "the join anyway."
    if (spark.conf.getOption(AnnForceJoinKey).exists(_.toBoolean)) log.warn(msg)
    else throw new graft.core.UserException(msg)
  }

  /** Session conf: probe-side replication factor for the over-cap
    * bucket equi-joins (LSH signature / IVF inverted list). The bucket
    * key space is SMALL by construction — 2^planes signatures,
    * nCentroids lists — so the join's shuffle parallelism is
    * key-capped and a dense region makes a hub bucket one task owns.
    * Salting splits every bucket S ways: candidates take a
    * deterministic salt from their id hash, probes replicate across
    * all S salts — each (probe, candidate) pair still meets in exactly
    * one salt, so results are IDENTICAL (the regime-equivalence specs
    * and the q81 oracle run salted). 0 (the default) = auto:
    * ceil(shuffle partitions / key count) — just enough to restore
    * full shuffle parallelism, a no-op when keys already exceed
    * partitions.
    */
  val AnnBucketSaltKey = "spark.graft.ann.bucketSalt"

  private def bucketSalt(spark: SparkSession, nKeys: Long): Int = {
    val conf = spark.conf.getOption(AnnBucketSaltKey).map(_.toInt).getOrElse(0)
    if (conf > 0) conf
    else {
      val parts = spark.sessionState.conf.numShufflePartitions.toLong
      math.min(math.max(1L, (parts + nKeys - 1) / nKeys), 1L << 20).toInt
    }
  }

  /** Salted bucket equi-join (see [[AnnBucketSaltKey]]): `cands` must
    * carry `cand_id`; both sides must carry `bucketCol`. Probe-side
    * rows replicate `salt` ways, so callers size `salt` against the
    * probe frame they pass.
    */
  private def saltedBucketJoin(
      cands: DataFrame, probes: DataFrame, bucketCol: String,
      salt: Int): DataFrame =
    if (salt <= 1) cands.join(probes, Seq(bucketCol))
    else {
      val salted = cands.withColumn("__salt",
        pmod(xxhash64(col("cand_id")), lit(salt.toLong)))
      val replicated = probes.withColumn("__salt",
        explode(typedlit((0L until salt.toLong).toSeq)))
      salted.join(replicated, Seq(bucketCol, "__salt")).drop("__salt")
    }

  /** Exact brute-force top-k of a probe SUBSET of `emb` against all
    * of `emb` — the single-frame convenience over
    * [[bruteForceTopKFrames]] (all regimes and contracts documented
    * there). Because the probes are a subset of the corpus here, the
    * role-swap regime never fires from this entry point (a probe set
    * too big to collect implies a corpus too big to collect); callers
    * with a separate query set use the frames form directly.
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      probeFilter: Column,
      k: Int,
      maxEmbeddedProbes: Int = 1 << 16,
      maxChunkedProbes: Int = 1 << 20,
      maxCollectBytes: Long = 512L << 20,
      dims: Option[Int] = None): DataFrame =
    bruteForceTopKFrames(
      emb.where(probeFilter).select(col(idCol), col(vecCol)), idCol, vecCol,
      emb, idCol, vecCol, k, maxEmbeddedProbes, maxChunkedProbes,
      maxCollectBytes, dims = dims)

  /** Exact brute-force top-k, probes and corpus as SEPARATE frames
    * (the usual real shape: a query set against a corpus). Four
    * regimes, identical results (spec-pinned):
    *  - EMBEDDED (probes ≤ `maxEmbeddedProbes`): the probe set — which
    *    a broadcast join would driver-collect anyway — embeds in a
    *    single `graft_probe_topk` aggregate; the corpus is scanned
    *    once with NO join-row materialization (the join formulation
    *    paid ~1.9 µs/pair of UnsafeRow plumbing around a ~30 ns dot at
    *    sf10). Exchange carries partitions × probes × k heap entries.
    *  - CHUNKED (gate < probes ≤ `maxChunkedProbes`): the probe set is
    *    split into ⌈n/gate⌉ balanced disjoint chunks and each chunk runs
    *    its own embedded kernel over the corpus, results unioned — the
    *    per-task heap memory stays gate × k (the reason the gate
    *    exists) at the price of one extra corpus scan per chunk, and
    *    STILL zero joined rows. Probes partition across chunks, so the
    *    union is exactly the single-kernel answer (r14 measurement,
    *    BENCHNOTES_r14 §: the join's ~µs/pair row plumbing dwarfs the
    *    re-scan cost by orders of magnitude at over-gate probe counts).
    *    NOTE when nChunks > 1: each chunk re-runs the corpus frame's
    *    full lineage — persist a DERIVED corpus (anything that isn't a
    *    plain parquet scan) before calling, or the upstream compute
    *    repeats per chunk.
    *  - ROLE SWAP (probes > `maxChunkedProbes` ≥ corpus): the CORPUS
    *    embeds instead — ⌈corpus/gate⌉ disjoint candidate chunks, each
    *    a `graft_corpus_topk` PROJECTION over one probe scan (no
    *    aggregate, no exchange, no joined rows); with multiple chunks
    *    the per-chunk arrays re-rank through graft_top_k (chunks are
    *    disjoint in candidate space, so the merged top-k is exact and
    *    the exchange carries ≤ probes × k × nChunks rows, never a
    *    cross product). This retires the join fallback for every case
    *    where EITHER side fits the collect cap.
    *  - JOIN (both sides above the cap): split-norm scoring + the
    *    graft_top_k aggregate over a non-equi join. NOT a peer: the
    *    `probe_id =!= cand_id` condition plans as CartesianProduct
    *    once the probe side outgrows broadcast, and the r14 sf10
    *    measurement killed it outright (2¹⁵ probes × 200k corpus: the
    *    per-partition right-side spill filled >60 GB of disk and the
    *    job died at ~17 min, where the chunked kernels finish in
    *    59 s — BENCHNOTES_r14). The engine therefore FAILS FAST here
    *    with the scale alternatives (`lshTopKFrames`/`ivfTopKFrames`,
    *    whose over-gate joins are bucket EQUI-joins) unless the session
    *    opts in via [[AnnForceJoinKey]]. Passing
    *    `maxEmbeddedProbes = 0` disables every kernel regime and runs
    *    the join silently (the spec seam pinning kernel ≡ join).
    *
    * Driver-memory bound: the winning side's (id, vector) matrix is
    * collected under BOTH a row cap (`maxChunkedProbes`) and a BYTE
    * budget (`maxCollectBytes`, default 512 MB) — dims are sniffed
    * from one probe row BEFORE anything collects, so the budget bounds
    * the gate prefix, the full matrix, AND each chunk's embedded plan
    * literal (see [[decideRegime]]); the regime decision itself
    * transfers O(effective gate) rows + two bounded counts, never a
    * full matrix it then discards.
    *
    * `includeSelf = true` is the CROSS-CORPUS mode: probe and
    * candidate ids come from unrelated id spaces, so a numeric id
    * collision is not a self-pair and must be scored; the default
    * exclusion serves the single-frame probes ⊆ corpus shape. Output
    * ids are BIGINT in every regime regardless of input id type.
    */
  def bruteForceTopKFrames(
      probes: DataFrame,
      probeIdCol: String,
      probeVecCol: String,
      corpus: DataFrame,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      maxEmbeddedProbes: Int = 1 << 16,
      maxChunkedProbes: Int = 1 << 20,
      maxCollectBytes: Long = 512L << 20,
      includeSelf: Boolean = false,
      dims: Option[Int] = None): DataFrame = {
    val spark = corpus.sparkSession
    val gate = math.max(maxEmbeddedProbes, 0)
    import org.apache.spark.sql.graftbridge.SparkBridge
    val dec = decideRegime(probes, probeIdCol, probeVecCol,
      Some((corpus, corpusIdCol, corpusVecCol)),
      gate, maxChunkedProbes, maxCollectBytes, knownDims = dims)
    dec.regime match {
      case AnnRegime.Probes(collected) =>
        // null id OR null vector: the join regime silently drops such
        // probes (a null-valued join/score condition never matches), so
        // the embedded regime must too, not NPE on getLong
        val usable = collected.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        val cand = Dedup.rebalance(
          corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
        val chunk = math.max(dec.chunkRows, 1)
        val nChunks = math.max(1, math.ceil(usable.length.toDouble / chunk).toInt)
        val frames = (0 until nChunks).map { c =>
          val lo = (c.toLong * usable.length / nChunks).toInt
          val hi = ((c + 1).toLong * usable.length / nChunks).toInt
          val slice = usable.slice(lo, hi)
          val pIds = slice.map(_.getLong(0))
          val pVecs = slice.map(_.getSeq[Double](1).toArray)
          val agg = SparkBridge.column(graft.functions.TopKFunctions.ProbeTopKAgg(
            SparkBridge.expression(cand("cand_id")),
            SparkBridge.expression(cand("cand_vec")),
            pIds, pVecs, k, includeSelf = includeSelf).toAggregateExpression())
          cand.agg(agg.as("tk"))
        }
        frames.reduce(_.union(_))
          .select(explode(col("tk")).as("e"))
          .select(col("e.probe_id").as("probe_id"), col("e.rank").as("rank"),
            col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
      case AnnRegime.Corpus(candCollected) =>
        // ROLE SWAP: embed the corpus, scan the probes
        val usable = candCollected.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        val probeFrame = Dedup.rebalance(
          probes.select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("probe_vec")))
        val chunk = math.max(dec.chunkRows, 1)
        val nChunks = math.max(1, math.ceil(usable.length.toDouble / chunk).toInt)
        // the kernel sits DIRECTLY inside the generator (never behind
        // a projected alias): InferFiltersFromGenerate skips non-cheap
        // generator inputs, but an aliased array gets a `size(tk) > 0`
        // filter inferred and pushed THROUGH the projection —
        // duplicating the whole corpus-chunk scoring loop per probe
        // row (measured: the q72 audit plan ran the kernel twice)
        def chunkKernel(c: Int): Column = {
          val lo = (c.toLong * usable.length / nChunks).toInt
          val hi = ((c + 1).toLong * usable.length / nChunks).toInt
          val slice = usable.slice(lo, hi)
          SparkBridge.column(graft.functions.TopKFunctions.CorpusTopK(
            SparkBridge.expression(probeFrame("probe_id")),
            SparkBridge.expression(probeFrame("probe_vec")),
            slice.map(_.getLong(0)), slice.map(_.getSeq[Double](1).toArray), k,
            includeSelf = includeSelf))
        }
        if (nChunks == 1) {
          // single chunk: the projected array IS the answer; rank =
          // position (the kernel emits best-first) — zero exchanges
          probeFrame
            .select(col("probe_id"), posexplode(chunkKernel(0)).as(Seq("pos", "e")))
            .select(col("probe_id").cast("long").as("probe_id"),
              (col("pos") + 1).cast("long").as("rank"),
              col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
        } else {
          // distributed k-merge: per-chunk winners re-rank through the
          // bounded graft_top_k aggregate — candidates are already
          // ROUNDED and chunks are disjoint in candidate space, so the
          // merged ordering is exactly the single-kernel answer; the
          // exchange carries ≤ probes × k × nChunks rows
          val scored = (0 until nChunks).map { c =>
            probeFrame.select(col("probe_id"), explode(chunkKernel(c)).as("e"))
              .select(col("probe_id"), col("e.cand_id").as("cand_id"),
                col("e.sim").as("sim"))
          }.reduce(_.union(_))
          rankTopK(scored, k)
        }
      case AnnRegime.BothOver =>
        if (gate > 0) enforceJoinContract(spark, "bruteForceTopK",
          dec.effectiveCap)
        val probeSide = probes
          .select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("probe_vec"))
          .withColumn("probe_norm", VectorFunctions.norm2(spark, col("probe_vec")))
        // rebalance: a single-row-group embedding file scans as ONE task,
        // which would serialize the |probes|×|corpus| cosine loop on one
        // core; no-op on multi-split tables (Dedup.rebalance)
        val cand = Dedup.rebalance(
          corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
          .withColumn("cand_norm", VectorFunctions.norm2(spark, col("cand_vec")))
        // NO broadcast hint above the embedded gate: the probe count is
        // known only to exceed the cap and can grow ∝ corpus, so a forced
        // broadcast is the one driver-OOM shape left at 100× (an 10^8-row
        // probe filter heads straight for the 8 GB cap). The planner
        // decides from its stats (AQE can still promote a genuinely small
        // side at runtime) — the same force-under-threshold /
        // planner-above pattern as the MoR DV anti-join
        // (LakeTable.DvBroadcastBytes).
        val joined =
          if (includeSelf)
            // the kernels drop null-id rows; the crossJoin has no join
            // condition to drop them implicitly (the `=!=` below does),
            // so filter explicitly or the join regime alone would emit
            // NULL-id result groups
            cand.where(col("cand_id").isNotNull)
              .crossJoin(probeSide.where(col("probe_id").isNotNull))
          else cand.join(probeSide, col("probe_id") =!= col("cand_id"))
        val scored = joined
          .withColumn("sim", splitScore(spark, col("probe_vec"), col("cand_vec"),
            col("probe_norm"), col("cand_norm")))
        rankTopK(scored, k)
    }
  }

  /** Deterministic hyperplane component for plane `p`, dim `d`:
    * md5-derived uniform in [-1, 1). Computed ONCE on the driver —
    * hyperplanes are constants, so they embed as literal arrays and
    * the per-row work is just the codegen'd dot-product kernel
    * (the expression-level formulation recomputed ~planes×dims md5
    * calls per row).
    */
  private[graft] def planeComponent(p: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$p:$d".getBytes("UTF-8"))
    val hex8 = digest.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex8, 16).toDouble / 2147483648.0 - 1.0
  }

  private def planeVector(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map(d => planeComponent(p, d))

  /** Sign-bit signature against `planes` literal hyperplanes of
    * dimension `dims`; one small integer per row, map-side only.
    */
  def lshSignature(df: DataFrame, vec: Column, planes: Int, dims: Int): Column = {
    val spark = df.sparkSession
    val v = vec.cast("array<double>")
    (0 until planes).map { p =>
      val dotp = VectorFunctions.dot(spark, v, typedlit(planeVector(p, dims)))
      when(dotp >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF-style ANN over a single frame: probes are a filtered subset
    * of `emb` — the convenience form of [[ivfTopKFrames]] (regimes,
    * quantizer, and salting documented there).
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      probeFilter: Column,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      trainedCentroids: Option[Array[Seq[Double]]] = None,
      maxEmbeddedProbes: Int = 1 << 16,
      maxChunkedProbes: Int = 1 << 20,
      maxCollectBytes: Long = 512L << 20,
      dims: Option[Int] = None): DataFrame =
    ivfTopKFrames(
      emb.where(probeFilter).select(col(idCol), col(vecCol)), idCol, vecCol,
      emb, idCol, vecCol, k, nCentroids, nProbe, trainedCentroids,
      maxEmbeddedProbes, maxChunkedProbes, maxCollectBytes, dims = dims)

  /** IVF-style ANN, probes and corpus as SEPARATE frames (the
    * cross-corpus decontamination shape — the restricted-index scale
    * alternative the exact operators' fail-fast message promises): a
    * deterministic coarse quantizer (the first `nCentroids` CORPUS
    * vectors by id, or `trainedCentroids` e.g. from
    * Clustering.kmeansCentroids) partitions the corpus into inverted
    * lists by nearest centroid; a probe searches only the `nProbe`
    * lists whose centroids are closest to it. Unlike LSH, list sizes
    * are data-adaptive; like real IVF, recall is tuned by `nProbe`.
    *
    * Regimes (same gates/rationale as [[bruteForceTopKFrames]] — no
    * role swap: the IVF restriction index is probe-side):
    *  - EMBEDDED/CHUNKED (probes within the collect caps): probes
    *    collect bounded, each probe's nProbe nearest lists resolve
    *    driver-side, and per probe chunk one `graft_probe_topk`
    *    aggregate scans the corpus with the centroid assignment and
    *    the per-list probe index INSIDE the kernel — no exploded probe
    *    frame, no joined rows.
    *  - JOIN (probes above the caps): the inverted-list bucket
    *    EQUI-join over the two frames — the legitimate scale path
    *    (never CartesianProduct), salted when the list count is below
    *    the shuffle parallelism ([[AnnBucketSaltKey]]).
    *
    * `includeSelf = true` scores id collisions in every regime
    * (cross-corpus id spaces — [[bruteForceTopKFrames]]).
    */
  def ivfTopKFrames(
      probes: DataFrame,
      probeIdCol: String,
      probeVecCol: String,
      corpus: DataFrame,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      trainedCentroids: Option[Array[Seq[Double]]] = None,
      maxEmbeddedProbes: Int = 1 << 16,
      maxChunkedProbes: Int = 1 << 20,
      maxCollectBytes: Long = 512L << 20,
      includeSelf: Boolean = false,
      dims: Option[Int] = None): DataFrame = {
    val spark = corpus.sparkSession
    // Coarse quantizer: nCentroids vectors collected to the driver
    // (metadata-scale) and embedded as literals, so list assignment is
    // a pure map-side expression — no shuffle touches the corpus until
    // the final per-probe top-k. The default id-prefix seed keeps the
    // operator self-contained and oracle-replayable.
    val centroids: Array[Seq[Double]] = trainedCentroids.getOrElse(
      corpus.orderBy(col(corpusIdCol)).limit(nCentroids)
        .select(col(corpusVecCol).cast("array<double>")).collect()
        .map(_.getSeq[Double](0)))

    val dec = decideRegime(probes, probeIdCol, probeVecCol,
      None, maxEmbeddedProbes, maxChunkedProbes, maxCollectBytes,
      knownDims = dims)
    dec.regime match {
      case AnnRegime.Probes(collectedProbes) =>
        import org.apache.spark.sql.graftbridge.SparkBridge
        val chunk = math.max(dec.chunkRows, 1)
        val cents: Array[Array[Double]] = centroids.map(_.toArray)
        def dotD(a: Array[Double], b: Array[Double]): Double = {
          val d = math.min(a.length, b.length)
          var s = 0.0; var i = 0
          while (i < d) { s += a(i) * b(i); i += 1 }
          s
        }
        // drop null-id AND null-vector probes, like the join regime does
        val usable = collectedProbes.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        val cand = Dedup.rebalance(
          corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
        val nChunks = math.max(1, math.ceil(usable.length.toDouble / chunk).toInt)
        return (0 until nChunks).map { c =>
          val lo = (c.toLong * usable.length / nChunks).toInt
          val hi = ((c + 1).toLong * usable.length / nChunks).toInt
          val slice = usable.slice(lo, hi)
          val pIds = slice.map(_.getLong(0))
          val pVecs = slice.map(_.getSeq[Double](1).toArray)
          val byList = Array.fill(cents.length)(
            scala.collection.mutable.ArrayBuffer.empty[Int])
          pVecs.zipWithIndex.foreach { case (v, pi) =>
            cents.indices
              .sortBy(cc => (-dotD(v, cents(cc)), cc)).take(nProbe)
              .foreach(cc => byList(cc) += pi)
          }
          val agg = SparkBridge.column(graft.functions.TopKFunctions.ProbeTopKAgg(
            SparkBridge.expression(cand("cand_id")),
            SparkBridge.expression(cand("cand_vec")),
            pIds, pVecs, k,
            centroids = cents, probesByList = byList.map(_.toArray),
            includeSelf = includeSelf)
            .toAggregateExpression())
          cand.agg(agg.as("tk"))
        }.reduce(_.union(_))
          .select(explode(col("tk")).as("e"))
          .select(col("e.probe_id").as("probe_id"), col("e.rank").as("rank"),
            col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
      case _ => // over the caps: the bucket EQUI-join below is the
                // legitimate scale path (never CartesianProduct)
    }

    /** top-`n` nearest centroid ids for a vector, as an array column:
      * sort a tiny struct array of (-dot, id) — map-side only.
      */
    def nearestLists(vec: Column, n: Int): Column = {
      val scored = array(centroids.zipWithIndex.map { case (c, p) =>
        struct((-VectorFunctions.dot(spark, vec, typedlit(c))).as("negs"),
          lit(p).as("id"))
      }.toSeq: _*)
      slice(transform(array_sort(scored), s => s.getField("id")), 1, n)
    }

    // rebalance before the per-row nCentroids×dims assignment dots —
    // a single-row-group corpus file must not serialize them
    val cand = Dedup.rebalance(
      corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
      .withColumn("list_id", element_at(nearestLists(col("cand_vec"), 1), 1))
      .withColumn("cand_norm", VectorFunctions.norm2(spark, col("cand_vec")))
    val probeSide = probes
      .select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("probe_vec"))
      .withColumn("list_id", explode(nearestLists(col("probe_vec"), nProbe)))
      .withColumn("probe_norm", VectorFunctions.norm2(spark, col("probe_vec")))
    // no broadcast hint above the embedded gate (see bruteForceTopK):
    // probe counts can grow ∝ corpus; the planner sizes the build side.
    // Salted: nCentroids list keys alone cap the shuffle parallelism
    val joined = saltedBucketJoin(cand, probeSide, "list_id",
      bucketSalt(spark, math.max(nCentroids.toLong, 1L)))
    val filtered =
      if (includeSelf)
        // match the kernels' null-id semantics (the `=!=` below drops
        // nulls implicitly; includeSelf has no condition that would)
        joined.where(col("probe_id").isNotNull && col("cand_id").isNotNull)
      else joined.where(col("probe_id") =!= col("cand_id"))
    val scored = filtered
      .withColumn("sim", splitScore(spark, col("probe_vec"), col("cand_vec"),
        col("probe_norm"), col("cand_norm")))
    rankTopK(scored, k)
  }

  /** ANN via LSH bucketing over a single frame: probes are a filtered
    * subset of `emb` — the convenience form of [[lshTopKFrames]]
    * (regimes and salting documented there).
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      probeFilter: Column,
      k: Int,
      planes: Int = 12,
      maxEmbeddedProbes: Int = 1 << 16,
      maxChunkedProbes: Int = 1 << 20,
      maxCollectBytes: Long = 512L << 20,
      dims: Option[Int] = None): DataFrame =
    lshTopKFrames(
      emb.where(probeFilter).select(col(idCol), col(vecCol)), idCol, vecCol,
      emb, idCol, vecCol, k, planes, maxEmbeddedProbes, maxChunkedProbes,
      maxCollectBytes, dims = dims)

  /** ANN via LSH bucketing, probes and corpus as SEPARATE frames (the
    * cross-corpus decontamination shape): exact rank within the
    * probe's signature bucket.
    *
    * Regime structure (spec-pinned equal; no role swap — the signature
    * restriction index is probe-side):
    *  - EMBEDDED (probes ≤ `maxEmbeddedProbes`, byte-shrunk by
    *    `maxCollectBytes` — [[decideRegime]]): probe signatures
    *    resolve driver-side against the deterministic hyperplanes and
    *    one `graft_probe_topk` aggregate scans the corpus with the
    *    signature hash and the per-bucket probe index INSIDE the
    *    kernel — the bucket equi-join's semantics with zero joined
    *    rows, zero signature column, zero shuffle before the k-bounded
    *    exchange.
    *  - CHUNKED (gate < probes ≤ the caps): ⌈n/gate⌉ disjoint probe
    *    chunks, one kernel each with its chunk-local signature index,
    *    results unioned — probes partition across chunks, so the union
    *    IS the single-kernel answer, still with zero joined rows.
    *  - JOIN (above the caps): signature bucket EQUI-join over the two
    *    frames — the legitimate scale path (never CartesianProduct) —
    *    WITHOUT a broadcast hint (probe counts can grow ∝ corpus; the
    *    planner sizes the build side, see bruteForceTopK), and SALTED
    *    when 2^planes is below the shuffle parallelism
    *    ([[AnnBucketSaltKey]]: the signature key space would otherwise
    *    cap the join at 2^planes tasks and hand a dense region's hub
    *    bucket to one of them).
    *
    * The embedding dimension for the join's signature expression is
    * the one [[decideRegime]] sniffed (no second sizing job); only the
    * kernels-disabled seam (`maxEmbeddedProbes = 0`) or an all-null
    * probe side still asks the frames.
    *
    * `includeSelf = true` scores id collisions in every regime
    * (cross-corpus id spaces — [[bruteForceTopKFrames]]).
    */
  def lshTopKFrames(
      probes: DataFrame,
      probeIdCol: String,
      probeVecCol: String,
      corpus: DataFrame,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      planes: Int = 12,
      maxEmbeddedProbes: Int = 1 << 16,
      maxChunkedProbes: Int = 1 << 20,
      maxCollectBytes: Long = 512L << 20,
      includeSelf: Boolean = false,
      dims: Option[Int] = None): DataFrame = {
    val spark = corpus.sparkSession
    require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
    val dec = decideRegime(probes, probeIdCol, probeVecCol,
      None, maxEmbeddedProbes, maxChunkedProbes, maxCollectBytes,
      knownDims = dims)
    dec.regime match {
      case AnnRegime.Probes(collected) =>
        import org.apache.spark.sql.graftbridge.SparkBridge
        val chunk = math.max(dec.chunkRows, 1)
        // null id or vector: dropped, like the bucket join drops them
        val usable = collected.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        val dims = usable.headOption.map(_.getSeq[Double](1).length).getOrElse(0)
        val planeMat: Array[Array[Double]] =
          Array.tabulate(planes, dims)((p, d) => planeComponent(p, d))
        def sigOf(v: Array[Double]): Long = {
          var sig = 0L
          var p = 0
          while (p < planes) {
            val pl = planeMat(p)
            val d = math.min(pl.length, v.length)
            var dot = 0.0
            var j = 0
            while (j < d) { dot += pl(j) * v(j); j += 1 }
            if (dot >= 0) sig |= 1L << p
            p += 1
          }
          sig
        }
        val cand = Dedup.rebalance(
          corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
        val nChunks = math.max(1, math.ceil(usable.length.toDouble / chunk).toInt)
        (0 until nChunks).map { c =>
          val lo = (c.toLong * usable.length / nChunks).toInt
          val hi = ((c + 1).toLong * usable.length / nChunks).toInt
          val slice = usable.slice(lo, hi)
          val pIds = slice.map(_.getLong(0))
          val pVecs = slice.map(_.getSeq[Double](1).toArray)
          val bySig: Map[Long, Array[Int]] =
            pVecs.indices.groupBy(pi => sigOf(pVecs(pi)))
              .map { case (s, idxs) => s -> idxs.toArray }
          val agg = SparkBridge.column(graft.functions.TopKFunctions.ProbeTopKAgg(
            SparkBridge.expression(cand("cand_id")),
            SparkBridge.expression(cand("cand_vec")),
            pIds, pVecs, k,
            planes = planeMat, probesBySig = bySig,
            includeSelf = includeSelf).toAggregateExpression())
          cand.agg(agg.as("tk"))
        }.reduce(_.union(_))
          .select(explode(col("tk")).as("e"))
          .select(col("e.probe_id").as("probe_id"), col("e.rank").as("rank"),
            col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
      case _ =>
        // Over the caps (or kernels disabled): the bucket equi-join.
        // Dims: reuse the decision's sniff; the gate=0 seam skipped it
        // (kernels disabled = zero extra jobs there), so fall back to
        // asking the probes, then the corpus — only non-null vectors
        // (size(null) is null → getInt NPEs), tolerating an all-null /
        // empty side (head() on empty throws): 0 dims then, and every
        // signature collapses to one bucket, which is correct (the
        // per-pair splitScore over null vectors yields no rows).
        val dims = dec.dims
          .orElse(probes.where(col(probeVecCol).isNotNull)
            .select(size(col(probeVecCol).cast("array<double>"))).head(1)
            .headOption.map(_.getInt(0)))
          .orElse(corpus.where(col(corpusVecCol).isNotNull)
            .select(size(col(corpusVecCol).cast("array<double>"))).head(1)
            .headOption.map(_.getInt(0)))
          .getOrElse(0)
        val probeSide = probes
          .select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("probe_vec"))
          .withColumn("sig", lshSignature(probes, col("probe_vec"), planes, dims))
          .withColumn("probe_norm", VectorFunctions.norm2(spark, col("probe_vec")))
        val cands = Dedup.rebalance(
          corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
          .withColumn("sig", lshSignature(corpus, col("cand_vec"), planes, dims))
          .withColumn("cand_norm", VectorFunctions.norm2(spark, col("cand_vec")))
        val joined = saltedBucketJoin(cands, probeSide, "sig",
          bucketSalt(spark, 1L << math.min(planes, 62)))
        val filtered =
          if (includeSelf)
            // kernel null-id semantics (see ivfTopKFrames)
            joined.where(col("probe_id").isNotNull && col("cand_id").isNotNull)
          else joined.where(col("probe_id") =!= col("cand_id"))
        val scored = filtered
          .withColumn("sim", splitScore(spark, col("probe_vec"), col("cand_vec"),
            col("probe_norm"), col("cand_norm")))
        rankTopK(scored, k)
    }
  }
}
