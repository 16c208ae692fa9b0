package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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
      .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
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
      maxChunkedProbes: Int = 1 << 20): DataFrame =
    bruteForceTopKFrames(
      emb.where(probeFilter).select(col(idCol), col(vecCol)), idCol, vecCol,
      emb, idCol, vecCol, k, maxEmbeddedProbes, maxChunkedProbes)

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
    *  - JOIN (both sides above `maxChunkedProbes`): split-norm scoring
    *    + the graft_top_k aggregate over a non-equi join. LAST RESORT,
    *    not a peer: the `probe_id =!= cand_id` condition plans as
    *    CartesianProduct once the probe side outgrows broadcast, and
    *    the r14 sf10 measurement killed it outright (2¹⁵ probes × 200k
    *    corpus: the per-partition right-side spill filled >60 GB of
    *    disk and the job died at ~17 min, where the chunked kernels
    *    finish in 59 s — BENCHNOTES_r14). With BOTH sides past the cap
    *    use `lshTopK`/`ivfTopK`, whose over-gate joins are bucket
    *    EQUI-joins. A warning is logged when this regime engages.
    *    Passing `maxEmbeddedProbes = 0` disables every kernel regime
    *    (used by specs to pin kernel ≡ join equality).
    *
    * `maxChunkedProbes` IS the driver-memory bound: the winning side's
    * (id, vector) rows are collected, ~`rows × dims × 8` bytes —
    * ≈0.5 GB at the default 2²⁰ × 64 dims, but ≈6 GB at 768-dim
    * embeddings. The cap is a ROW count, not bytes: at high dimension
    * lower it to keep `rows × dims × 8` inside driver headroom.
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
      maxChunkedProbes: Int = 1 << 20): DataFrame = {
    val spark = corpus.sparkSession
    val gate = math.max(maxEmbeddedProbes, 0)
    // chunking disabled when the embedded gate is (chunk size would be
    // 0) or when the caller caps chunked at/below the gate; clamped so
    // `limit(chunkCap + 1)` can't overflow when a caller takes the
    // fallback warning's advice literally and passes Int.MaxValue
    val chunkCap =
      if (gate == 0) 0
      else math.min(math.max(maxChunkedProbes, gate), Int.MaxValue - 1)
    // one bounded collect decides the regime AND supplies the matrix:
    // limit(cap+1) keeps the job O(cap) even on a pathological
    // probe filter that matches the whole corpus
    val collected = probes
      .select(col(probeIdCol).cast("long"), col(probeVecCol).cast("array<double>"))
      .limit(chunkCap + 1).collect()
    if (collected.length <= chunkCap && gate > 0) {
      import org.apache.spark.sql.graftbridge.SparkBridge
      // null id OR null vector: the join regime silently drops such
      // probes (a null-valued join/score condition never matches), so
      // the embedded regime must too, not NPE on getLong
      val usable = collected.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      val cand = Dedup.rebalance(
        corpus.select(col(corpusIdCol).as("cand_id"), col(corpusVecCol).as("cand_vec")))
      val nChunks = math.max(1, math.ceil(usable.length.toDouble / gate).toInt)
      val frames = (0 until nChunks).map { c =>
        val lo = (c.toLong * usable.length / nChunks).toInt
        val hi = ((c + 1).toLong * usable.length / nChunks).toInt
        val slice = usable.slice(lo, hi)
        val pIds = slice.map(_.getLong(0))
        val pVecs = slice.map(_.getSeq[Double](1).toArray)
        val agg = SparkBridge.column(graft.functions.TopKFunctions.ProbeTopKAgg(
          SparkBridge.expression(cand("cand_id")),
          SparkBridge.expression(cand("cand_vec")),
          pIds, pVecs, k).toAggregateExpression())
        cand.agg(agg.as("tk"))
      }
      frames.reduce(_.union(_))
        .select(explode(col("tk")).as("e"))
        .select(col("e.probe_id").as("probe_id"), col("e.rank").as("rank"),
          col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
    } else {
      // probes exceed the collect cap — try the ROLE SWAP before
      // surrendering to the join: embed the corpus if IT fits
      val candCollected =
        if (gate == 0) null
        else corpus
          .select(col(corpusIdCol).cast("long"), col(corpusVecCol).cast("array<double>"))
          .limit(chunkCap + 1).collect()
      if (candCollected != null && candCollected.length <= chunkCap) {
        import org.apache.spark.sql.graftbridge.SparkBridge
        val usable = candCollected.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        val probeFrame = Dedup.rebalance(
          probes.select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("probe_vec")))
        val nChunks = math.max(1, math.ceil(usable.length.toDouble / gate).toInt)
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
            slice.map(_.getLong(0)), slice.map(_.getSeq[Double](1).toArray), k))
        }
        if (nChunks == 1) {
          // single chunk: the projected array IS the answer; rank =
          // position (the kernel emits best-first) — zero exchanges
          probeFrame
            .select(col("probe_id"), posexplode(chunkKernel(0)).as(Seq("pos", "e")))
            .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"),
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
      } else {
        if (gate > 0) log.warn(
          s"bruteForceTopK: BOTH probe and corpus side exceed " +
            s"maxChunkedProbes=$chunkCap — falling back to the non-equi " +
            "join (plans as CartesianProduct above broadcast size; " +
            "measured disk-bound at sf10, BENCHNOTES_r14). Raise " +
            "maxChunkedProbes or use lshTopK/ivfTopK at this scale.")
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
        val scored = cand.join(probeSide, col("probe_id") =!= col("cand_id"))
          .withColumn("sim", splitScore(spark, col("probe_vec"), col("cand_vec"),
            col("probe_norm"), col("cand_norm")))
        rankTopK(scored, k)
      }
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

  /** IVF-style ANN: a deterministic coarse quantizer (the first
    * `nCentroids` corpus vectors by id) partitions the corpus into
    * inverted lists by nearest centroid; a probe searches only the
    * `nProbe` lists whose centroids are closest to it. Unlike LSH,
    * list sizes are data-adaptive; like real IVF, recall is tuned by
    * `nProbe`. Centroid assignment is a broadcast of `nCentroids`
    * vectors — the corpus scan stays shuffle-free until the final
    * per-probe top-k.
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
      maxEmbeddedProbes: Int = 1 << 16): DataFrame = {
    val spark = emb.sparkSession
    // Coarse quantizer: nCentroids vectors collected to the driver
    // (metadata-scale) and embedded as literals, so list assignment is
    // a pure map-side expression — no shuffle touches the corpus until
    // the final per-probe top-k. Pass `trainedCentroids` (e.g.
    // Clustering.kmeansCentroids) for a real quantizer; the default
    // id-prefix seed keeps the operator self-contained and
    // oracle-replayable.
    val centroids: Array[Seq[Double]] = trainedCentroids.getOrElse(
      emb.orderBy(col(idCol)).limit(nCentroids)
        .select(col(vecCol).cast("array<double>")).collect()
        .map(_.getSeq[Double](0)))

    // EMBEDDED regime (same gate/rationale as bruteForceTopK): probes
    // collect once, each probe's nProbe nearest lists resolve
    // driver-side with nearestLists' exact (-dot, id) ordering, and a
    // single graft_probe_topk aggregate scans the corpus with the
    // centroid assignment and the per-list probe index INSIDE the
    // kernel — no exploded probe frame, no joined rows.
    val collectedProbes = emb.where(probeFilter)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .limit(maxEmbeddedProbes + 1).collect()
    if (collectedProbes.length <= maxEmbeddedProbes) {
      import org.apache.spark.sql.graftbridge.SparkBridge
      val cents: Array[Array[Double]] = centroids.map(_.toArray)
      def dotD(a: Array[Double], b: Array[Double]): Double = {
        val d = math.min(a.length, b.length)
        var s = 0.0; var i = 0
        while (i < d) { s += a(i) * b(i); i += 1 }
        s
      }
      // drop null-id AND null-vector probes, like the join regime does
      val usable = collectedProbes.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      val pIds = usable.map(_.getLong(0))
      val pVecs = usable.map(_.getSeq[Double](1).toArray)
      val byList = Array.fill(cents.length)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      pVecs.zipWithIndex.foreach { case (v, pi) =>
        cents.indices
          .sortBy(c => (-dotD(v, cents(c)), c)).take(nProbe)
          .foreach(c => byList(c) += pi)
      }
      val corpus = Dedup.rebalance(
        emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec")))
      val agg = SparkBridge.column(graft.functions.TopKFunctions.ProbeTopKAgg(
        SparkBridge.expression(corpus("cand_id")),
        SparkBridge.expression(corpus("cand_vec")),
        pIds, pVecs, k,
        centroids = cents, probesByList = byList.map(_.toArray))
        .toAggregateExpression())
      return corpus.agg(agg.as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.probe_id").as("probe_id"), col("e.rank").as("rank"),
          col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
    }

    /** top-`n` nearest centroid ids for a vector, as an array column:
      * sort a tiny struct array of (-dot, id) — map-side only.
      */
    def nearestLists(df: DataFrame, vec: Column, n: Int): Column = {
      val scored = array(centroids.zipWithIndex.map { case (c, p) =>
        struct((-VectorFunctions.dot(spark, vec, typedlit(c))).as("negs"),
          lit(p).as("id"))
      }.toSeq: _*)
      slice(transform(array_sort(scored), s => s.getField("id")), 1, n)
    }

    // rebalance before the per-row nCentroids×dims assignment dots —
    // a single-row-group corpus file must not serialize them
    val corpus = Dedup.rebalance(
      emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec")))
      .withColumn("list_id", element_at(nearestLists(emb, col("cand_vec"), 1), 1))
      .withColumn("cand_norm", VectorFunctions.norm2(spark, col("cand_vec")))
    val probes = emb.where(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
      .withColumn("list_id", explode(nearestLists(emb, col("probe_vec"), nProbe)))
      .withColumn("probe_norm", VectorFunctions.norm2(spark, col("probe_vec")))
    // no broadcast hint above the embedded gate (see bruteForceTopK):
    // probe counts can grow ∝ corpus; the planner sizes the build side
    val scored = corpus.join(probes, Seq("list_id"))
      .where(col("probe_id") =!= col("cand_id"))
      .withColumn("sim", splitScore(spark, col("probe_vec"), col("cand_vec"),
        col("probe_norm"), col("cand_norm")))
    rankTopK(scored, k)
  }

  /** ANN via LSH bucketing: exact rank within the probe's bucket.
    *
    * Same two-regime structure as bruteForceTopK/ivfTopK
    * (spec-pinned equal):
    *  - EMBEDDED (probes ≤ `maxEmbeddedProbes`): probe signatures
    *    resolve driver-side against the deterministic hyperplanes and
    *    one `graft_probe_topk` aggregate scans the corpus with the
    *    signature hash and the per-bucket probe index INSIDE the
    *    kernel — the bucket equi-join's semantics with zero joined
    *    rows, zero signature column, zero shuffle before the k-bounded
    *    exchange.
    *  - JOIN (above the gate): signature bucket equi-join — WITHOUT a
    *    broadcast hint (probe counts can grow ∝ corpus; the planner
    *    sizes the build side, see bruteForceTopK).
    *
    * The embedding dimension comes from the first collected probe
    * (uniform dims — splitScore's precondition), folding the one-row
    * `head()` sizing job the previous formulation paid; only the
    * over-gate regime with an all-null collected prefix still asks the
    * corpus.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      probeFilter: Column,
      k: Int,
      planes: Int = 12,
      maxEmbeddedProbes: Int = 1 << 16): DataFrame = {
    val spark = emb.sparkSession
    require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
    val collected = emb.where(probeFilter)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .limit(maxEmbeddedProbes + 1).collect()
    // null id or vector: dropped, like the bucket join drops them
    val usable = collected.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    if (collected.length <= maxEmbeddedProbes) {
      import org.apache.spark.sql.graftbridge.SparkBridge
      val pIds = usable.map(_.getLong(0))
      val pVecs = usable.map(_.getSeq[Double](1).toArray)
      val dims = if (pVecs.isEmpty) 0 else pVecs(0).length
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
      val bySig: Map[Long, Array[Int]] =
        pVecs.indices.groupBy(pi => sigOf(pVecs(pi)))
          .map { case (s, idxs) => s -> idxs.toArray }
      val corpus = Dedup.rebalance(
        emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec")))
      val agg = SparkBridge.column(graft.functions.TopKFunctions.ProbeTopKAgg(
        SparkBridge.expression(corpus("cand_id")),
        SparkBridge.expression(corpus("cand_vec")),
        pIds, pVecs, k,
        planes = planeMat, probesBySig = bySig).toAggregateExpression())
      corpus.agg(agg.as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.probe_id").as("probe_id"), col("e.rank").as("rank"),
          col("e.cand_id").as("cand_id"), col("e.sim").as("sim"))
    } else {
      // all-null collected prefix: ask the corpus, but only non-null
      // vectors (size(null) is null → getInt NPEs) and tolerate an
      // all-null / empty corpus (head() on empty throws) — 0 dims then,
      // and every signature collapses to one bucket, which is correct
      // (the per-pair splitScore over null vectors yields no rows).
      val dims = usable.headOption.map(_.getSeq[Double](1).length)
        .getOrElse(emb.where(col(vecCol).isNotNull)
          .select(size(col(vecCol))).head(1)
          .headOption.map(_.getInt(0)).getOrElse(0))
      val probes = emb.where(probeFilter)
        .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
        .withColumn("sig", lshSignature(emb, col("probe_vec"), planes, dims))
        .withColumn("probe_norm", VectorFunctions.norm2(spark, col("probe_vec")))
      val cands = Dedup.rebalance(
        emb.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec")))
        .withColumn("sig", lshSignature(emb, col("cand_vec"), planes, dims))
        .withColumn("cand_norm", VectorFunctions.norm2(spark, col("cand_vec")))
      val scored = cands.join(probes, Seq("sig"))
        .where(col("probe_id") =!= col("cand_id"))
        .withColumn("sim", splitScore(spark, col("probe_vec"), col("cand_vec"),
          col("probe_norm"), col("cand_norm")))
      rankTopK(scored, k)
    }
  }
}
