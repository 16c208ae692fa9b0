package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the clustering step a dedup
  * pipeline runs AFTER candidate-pair generation (MinHash/SimHash give
  * near-duplicate PAIRS; keeping one document per duplicate CLUSTER
  * needs the transitive closure of those pairs).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). Each
  * round is two relational passes (explode edges by endpoint, groupBy
  * node, re-emit edges toward the neighborhood minimum), and the edge
  * set provably converges to per-component stars in O(log²  n) rounds —
  * unlike naive label propagation, whose round count is the graph
  * DIAMETER (a 1M-node chain needs 1M rounds; star-contraction needs
  * ~20). Every pass is a hash shuffle on node id: no driver-side graph,
  * no adjacency lists collected anywhere, so a round scales to
  * billions of edges exactly like any other groupBy.
  *
  * Between rounds the edge set is re-persisted and its lineage cut
  * (reliable `checkpoint` when the session has a checkpoint dir — the
  * cluster-deployment setting — else `localCheckpoint`): iterative
  * DataFrame algorithms otherwise build an exponentially deepening
  * plan that stalls the optimizer long before the data is the problem.
  */
object ConnectedComponents {

  /** Large-star: for every node u, connect every STRICTLY LARGER
    * neighbor v to m = min(Γ(u) ∪ u). Keeps all inter-component
    * connectivity while shrinking large-id fan-out.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(least(min("v"), col("u")).as("m"))
    sym.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient every edge max→min, then for every node u
    * connect every (smaller) neighbor — and u itself — to the
    * neighborhood minimum.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val m = oriented.groupBy("u").agg(min("v").as("m"))
    val relink = oriented.join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
    relink.where(col("u") =!= col("v")).distinct()
  }

  /** Component label for every vertex: (id, component) where component
    * is the minimum vertex id in the connected component. `edges` is an
    * undirected pair list (id_a, id_b) in its first two columns;
    * `vertices` supplies the full id universe so isolated vertices
    * label themselves.
    */
  /** Edge-count threshold below which the transitive closure runs as
    * ONE union-find task instead of distributed contraction rounds —
    * the AQE-style runtime adaptivity decision: each distributed round
    * is 4 shuffle stages + a convergence job, pure overhead when the
    * deduplicated edge set fits a single task comfortably (4M edges =
    * 64 MB of long pairs; the single-task union-find pass costs ~1-2 s
    * where ONE distributed round costs more — measured in the r10
    * q47 sf10 decomposition, where crossing the old 1M threshold
    * accounted for most of a 21× jump). Pass 0 to force the
    * distributed path.
    */
  val DefaultSmallGraphMaxEdges: Long = 4000000L

  def labels(vertices: DataFrame, idCol: String, edges: DataFrame): DataFrame =
    labels(vertices, idCol, edges, DefaultSmallGraphMaxEdges)

  def labels(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      smallGraphMaxEdges: Long): DataFrame = {
    val spark = vertices.sparkSession
    val hasCkptDir = spark.sparkContext.getCheckpointDir.isDefined
    // Lineage cut with an explicit release handle: each round persists
    // ONE RDD instance and unpersists the superseded round once the
    // next is materialized — a 20-round run pins one edge set, not 20.
    // (persist keeps lineage as an eviction fallback, which
    // localCheckpoint would not; the final round's blocks are released
    // by the ContextCleaner when the returned frame is dropped.)
    // Reliable checkpoints (cluster setting) clean via
    // spark.cleaner.referenceTracking.cleanCheckpoints.
    def cut(df: DataFrame): (DataFrame, () => Unit) =
      if (hasCkptDir) (df.checkpoint(), () => ())
      else {
        val rdd = df.rdd
        rdd.persist(StorageLevel.MEMORY_AND_DISK)
        (spark.createDataFrame(rdd, df.schema), () => { rdd.unpersist(blocking = false); () })
      }

    val Seq(ea, eb) = edges.columns.take(2).toSeq
    // ids are contracted as longs; a silent cast would null out
    // string/UUID ids and "succeed" with one (null,null) row — fail
    // loudly instead (hash non-numeric ids to longs upstream)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    (Seq(vertices.schema(idCol)) ++ Seq(edges.schema(ea), edges.schema(eb)))
      .foreach { f =>
        if (!integral(f.dataType))
          throw new IllegalArgumentException(
            s"ConnectedComponents requires integral ids; column ${f.name} is " +
              s"${f.dataType.simpleString} (hash it to a long first)")
      }
    var (e, release) = cut(edges.select(col(ea).cast("long").as("u"), col(eb).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct())
    // Convergence = identical edge set across a round. Both sides are
    // distinct (u,v) sets, so compare a one-pass fingerprint
    // (cardinality, sum of per-edge hashes): one tiny aggregation job
    // per round instead of a set-difference join. A colliding unequal
    // set (~2^-64) would only stop the provably-convergent contraction
    // one round early.
    def fingerprint(df: DataFrame): (Long, Long) = {
      // sum() over xxhash64 wraps on Long overflow BY DESIGN: the value
      // is only an equality fingerprint, so mod-2^64 arithmetic is fine
      // (order-independent, deterministic) — this is a deliberate
      // exception to the repo's "never rely on wrap" rule.
      val r = df.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = fingerprint(e)
    var converged = sig._1 == 0L
    // Small-graph fast path: the deduplicated edge set fits one task,
    // so a single union-find pass (union-by-min-root + path
    // compression, O(E α)) replaces every contraction round — one job
    // instead of rounds × (4 shuffle stages + a convergence job). The
    // labels are identical to the distributed path's (spec-compared):
    // union-by-min-root makes each tree's root the component minimum.
    if (!converged && sig._1 <= smallGraphMaxEdges) {
      import spark.implicits._
      val flat = e.select(col("u"), col("v")).as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          it.foreach { case (u, v) =>
            val ru = find(u); val rv = find(v)
            if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
          }
          val ks = parent.keysIterator.toArray
          ks.iterator.map(k => (k, find(k)))
        }
        .toDF("u", "v")
      val (stars, releaseStars) = cut(flat)
      // checkpoint() is already eager; the persist branch needs an
      // action to materialize blocks BEFORE freeing e they derive from
      if (!hasCkptDir) stars.count()
      release()
      e = stars
      release = releaseStars
      converged = true
    }
    var rounds = 0
    val maxRounds = 50
    while (!converged && rounds < maxRounds) {
      val (next, releaseNext) = cut(smallStar(largeStar(e)))
      val nextSig = fingerprint(next) // materializes `next`
      release()                       // superseded round's blocks freed
      release = releaseNext
      converged = nextSig == sig
      sig = nextSig
      e = next
      rounds += 1
    }
    // Star-contraction provably converges in O(log² n) rounds; hitting
    // the cap means something is structurally wrong (or a graph beyond
    // any practical size) — returning unconverged labels would be
    // silently WRONG components, so fail instead.
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxRounds rounds " +
          s"(${sig._1} edges remain); labels would be unreliable")
    // After convergence small-star output is a star per component:
    // u → component min. Isolated vertices keep their own id.
    val verts = vertices.select(col(idCol).cast("long").as("id")).distinct()
    verts.join(e.select(col("u").as("id"), col("v").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Spanning forest of an edge set: a connectivity-equivalent edge
    * set whose SIZE is bounded by the number of distinct vertices, not
    * by the number of edges — the linear-output reduction for
    * producers whose raw edge set grows quadratically (a thresholded
    * pair-verification stage emits ~n² pairs inside a near-dup
    * cluster; its closure needs only ~n of them).
    *
    * One map-side pass, NO shuffle: each task runs union-find
    * (union-by-min-root + path compression — the same kernel as the
    * small-graph fast path above) over its partition's edges and emits
    * one star edge per non-root vertex it saw. Correctness is the
    * classical composition fact: a spanning forest of each partition's
    * edge subset preserves that subset's transitive closure exactly,
    * and the closure of a union of edge sets depends only on the
    * closures of its parts — so `labels(spanningForest(E)) ==
    * labels(E)` for every vertex (spec-pinned; isolated vertices never
    * appear in either edge set and label themselves in both).
    *
    * Output is ≤ (distinct vertex ids in the partition) rows per
    * partition — for a verify stage over candidate pairs that is
    * corpus-linear where the pair set is cluster-size-quadratic. Task
    * memory is one LongMap entry per distinct id in the partition
    * (pair-verification frames touch few distinct ids by construction;
    * for arbitrary edge frames size partitions so ids-per-partition
    * fits the executor, as any groupBy there would anyway).
    */
  def spanningForest(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val Seq(ea, eb) = edges.columns.take(2).toSeq
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    Seq(edges.schema(ea), edges.schema(eb)).foreach { f =>
      if (!integral(f.dataType))
        throw new IllegalArgumentException(
          s"spanningForest requires integral ids; column ${f.name} is " +
            s"${f.dataType.simpleString} (hash it to a long first)")
    }
    edges.select(col(ea).cast("long"), col(eb).cast("long"))
      .where(col(ea) =!= col(eb)) // drops self-loops AND null endpoints
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (u, v) =>
          val ru = find(u); val rv = find(v)
          if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
        }
        val ks = parent.keysIterator.toArray
        ks.iterator.map(k => (k, find(k))).filter { case (k, r) => k != r }
      }
      .toDF(ea, eb)
  }

  /** Duplicate-cluster summary: one row per component with its size and
    * the kept (minimum-id) representative — the shape an ingest
    * pipeline joins back against to drop all-but-one copy.
    */
  def clusterSummary(vertices: DataFrame, idCol: String, edges: DataFrame): DataFrame =
    labels(vertices, idCol, edges)
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"))
}
