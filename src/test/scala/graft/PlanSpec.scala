package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants: the properties that decide whether these
  * queries survive a 100× scale-up. A correctness-green query with a
  * regressed plan (lost pushdown, cartesian join, shuffle where a
  * broadcast belongs) fails here before it fails in production.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    queries.Queries.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("filters and projections reach the parquet scan") {
    val p = plan("q04_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(400))
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(p.contains("l_quantity") && !p.contains("l_extendedprice"))
  }

  test("dimension joins broadcast; no shuffle join in the star queries") {
    for (q <- Seq("q11_top_revenue", "q12_regional_revenue")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to shuffle join")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q12 floor pinned: one fact-side shuffle, broadcast dims, codegen join+agg") {
    // BENCHNOTES_r7 §4 measured this plan AT the engine floor (the 2×2
    // broadcast-ceiling × bloom-filter A/B lost every cell); this spec
    // pins the shape so the floor argument cannot rot: the fact side
    // pays exactly ONE shuffle exchange (the final aggregation's), all
    // dimension joins broadcast, and the join+agg pipeline stays
    // inside whole-stage codegen.
    val d = queries.Queries.queries("q12_regional_revenue")(spark, dir)
    d.collect() // AQE materializes final stages (with codegen spans) at run time
    // the adaptive plan prints Final Plan then Initial Plan — assert on
    // the final section only (the initial copy double-counts exchanges)
    val p = d.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin") && !p.contains("CartesianProduct"), p.take(600))
    val shuffles = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles == 1, s"expected exactly 1 shuffle exchange, got $shuffles\n$p")
    // '*(n)' prefixes mark whole-stage-codegen membership: every join
    // and every aggregate must carry one
    val joinLines = p.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(joinLines.nonEmpty && joinLines.forall(_.contains("*(")),
      s"join outside codegen:\n${joinLines.mkString("\n")}")
    assert(aggLines.nonEmpty && aggLines.forall(_.contains("*(")),
      s"aggregate outside codegen:\n${aggLines.mkString("\n")}")
  }

  test("aggregations are partial (map-side combine) and hash-based") {
    val p = plan("q10_pricing_summary")
    // the decimal sums run through the int128 kernel (DecimalSum128 /
    // DecimalSumProduct128) — still partial-aggregated map-side
    assert(p.contains("partial_graft_decimal_sum"))
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"))
    // minhash signatures are computed MAP-SIDE by the compiled kernel
    // (no signature aggregation exists at all); the banding pipeline's
    // remaining aggs — bucket collect_list, pair distinct — stay
    // partial and never demote to SortAggregate. This
    // signatures→banding pipeline IS q21's whole (lazy) plan.
    val spark0 = spark
    val docs = spark0.read.parquet(s"$dir/documents.parquet")
    val m = operators.Dedup.bandingPairs(
      operators.Dedup.minhashSignatures(docs, "doc_id", "text", 8), 8, 4)
      .queryExecution.executedPlan.toString
    assert(m.contains("graft_minhash_signature") && !m.contains("SortAggregate"))
    assert(m.contains("partial_collect_list"))
  }

  test("set overlap never ships element arrays through an exchange") {
    val spark0 = spark
    import org.apache.spark.sql.functions._
    val docs = spark0.read.parquet(s"$dir/documents.parquet")
    val pairs = docs.where(col("doc_id") % 37 === 0).select(col("doc_id").as("id_a"))
      .crossJoin(docs.where(col("doc_id") % 41 === 0).select(col("doc_id").as("id_b")))
      .where(col("id_a") < col("id_b"))
    // AQE wraps the plan in AdaptiveSparkPlanExec (no visible
    // children), so disable it for this structural inspection
    val prevAqe = spark0.conf.get("spark.sql.adaptive.enabled", "true")
    spark0.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // inspect the overlap plan over raw inputs (the public setOverlap
      // checkpoints its INPUTS, so its plan scans materialized RDDs).
      // Pre-spread the TEXT like shingleOverlap does, so the input
      // rebalance shuffles strings, never the shingle arrays.
      val sets = docs.repartition(spark0.sparkContext.defaultParallelism)
        .select(col("doc_id").as("id"),
          array_distinct(operators.Dedup.shingles(col("text"))).as("elems"))
      val qe = operators.Dedup.setOverlapPlan(
        operators.Dedup.explodedHashes(sets), pairs)
        .queryExecution
      val p = qe.executedPlan.toString
      // intersection counts are partial-aggregated on the pair key...
      assert(p.contains("partial_count"), p.take(600))
      // ...and every exchange carries only fixed-width columns — the
      // shingle arrays are exploded to 60-bit hashes before any shuffle
      import org.apache.spark.sql.execution.exchange.Exchange
      import org.apache.spark.sql.types.ArrayType
      val exchanges = qe.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.nonEmpty)
      for (e <- exchanges)
        assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
          s"array column crosses exchange: ${e.output.map(a => a.name -> a.dataType)}")
    } finally spark0.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("ANN top-k: embedded regime has no join at all; fallback rides partial aggregation") {
    // embedded regime (probes within the gate — q25's default): the
    // probe matrix lives inside one graft_probe_topk aggregate over
    // the corpus scan — no joined rows, no Window, exchange carries
    // partial heaps only
    val p = plan("q25_ann_bruteforce")
    assert(p.contains("graft_probe_topk"), p.take(600))
    assert(!p.contains("Window"), "scored frame must not reach a window sort")
    assert(!p.contains("NestedLoop"), "embedded regime must not join")
    // join fallback (probes above the gate): broadcast join feeding
    // the graft_top_k aggregate — partial per map task BEFORE the
    // exchange (the window formulation would shuffle every scored
    // pair), per-side norms below the join so the per-pair kernel is
    // the dot alone
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val jp = operators.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") % 100 === 0, k = 5,
        maxEmbeddedProbes = 0)
      .queryExecution.executedPlan.toString
    assert(jp.contains("partial_graft_top_k"), jp.take(600))
    assert(!jp.contains("Window"))
    assert(jp.contains("graft_norm2") && jp.contains("graft_dot"))
  }

  test("ANN join fallbacks: probe broadcast is planner-gated, never forced") {
    // above the embedded-probe gate the probe count is known only to
    // exceed 2^16 and grows ∝ corpus — a forced broadcast(probes) is a
    // driver-OOM at 100×. With the hint dropped, the PLANNER sizes the
    // build side: under a tiny autoBroadcastJoinThreshold (simulating
    // a probe side past the cap) no BroadcastExchange may appear.
    // (AQE promoting a genuinely small side at runtime stays allowed —
    // that is the point of planner-gating.)
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    val prev = spark0.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark0.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = spark0.read.parquet(s"$dir/embeddings.parquet")
      val plans = Seq(
        "bruteForceTopK" -> operators.Similarity.bruteForceTopK(
          emb, "vec_id", "embedding", col("vec_id") % 100 === 0, k = 5,
          maxEmbeddedProbes = 0),
        "ivfTopK" -> operators.Similarity.ivfTopK(
          emb, "vec_id", "embedding", col("vec_id") % 100 === 0, k = 5,
          nCentroids = 4, nProbe = 2, maxEmbeddedProbes = 0),
        "lshTopK" -> operators.Similarity.lshTopK(
          emb, "vec_id", "embedding", col("vec_id") % 100 === 0, k = 5,
          planes = 6, maxEmbeddedProbes = 0),
        "embeddingNearDup" -> operators.Dedup.embeddingNearDup(
          emb, "vec_id", "embedding", col("vec_id") % 100 === 0,
          threshold = 0.5, maxEmbeddedProbes = 0))
      for ((name, df) <- plans) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastExchange"),
          s"$name forces a probe broadcast above the gate:\n${p.take(800)}")
      }
    } finally spark0.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join: one hash exchange, no range blowup") {
    val p = plan("q18_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("whole-stage codegen covers the scan-side of the hot queries") {
    // AQE only materializes final stages (with codegen spans) at run time
    for (q <- Seq("q10_pricing_summary", "q27_text_stats", "q29_fingerprint")) {
      val d = queries.Queries.queries(q)(spark, dir)
      d.collect()
      val p = d.queryExecution.executedPlan.toString
      // codegen'd operators carry the `*(n)` stage marker in tree output
      assert(p.contains("*("), s"$q dropped out of codegen")
    }
  }

  test("catalog (DSv2) scan prunes columns and pushes filters like V1") {
    val spark0 = spark
    import spark0.implicits._
    spark0.sql("DROP TABLE IF EXISTS graft.default.plan_v2")
    spark0.sql("""CREATE TABLE graft.default.plan_v2
      (id BIGINT, name STRING, price DOUBLE, cat STRING) USING graft""")
    spark0.sql("""INSERT INTO graft.default.plan_v2
      SELECT id, concat('n', id), id * 1.5, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END
      FROM range(100)""")
    val df = spark0.sql("SELECT name FROM graft.default.plan_v2 WHERE id = 2")
    assert(df.as[String].collect().toSeq == Seq("n2"))
    val p = df.queryExecution.executedPlan.toString
    // the V1Scan bridge surfaces the pushed set on the scan node …
    assert(p.contains("EqualTo(id,2)"), p.take(600))
    // … and the scan schema is the pruned {id,name}, never price/cat
    assert(!p.contains("price") && !p.contains("cat"), p.take(600))
    spark0.sql("DROP TABLE graft.default.plan_v2")
  }
}
