package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference union-find, the ground truth the distributed algorithm
    * must reproduce: component = min id reachable.
    */
  private def expected(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def check(n: Long, edges: Seq[(Long, Long)]): Unit = {
    val verts = (0L until n).toDF("id")
    val e = edges.toDF("id_a", "id_b")
    // the adaptive small-graph path and the distributed contraction
    // path must produce identical labels
    val small = ConnectedComponents.labels(verts, "id", e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = ConnectedComponents
      .labels(verts, "id", e, smallGraphMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == expected(n, edges))
    assert(distributed == expected(n, edges))
  }

  test("chain graph (the diameter case naive propagation loses)") {
    check(64, (0L until 63L).map(i => (i, i + 1)))
  }

  test("two components + isolated vertices + duplicate/reversed edges") {
    check(12, Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 0L), (5L, 7L), (7L, 5L), (7L, 9L)))
  }

  test("star and cycle") {
    val star = (1L to 8L).map(i => (0L, i))
    val cycle = Seq((9L, 10L), (10L, 11L), (11L, 9L))
    check(13, star ++ cycle)
  }

  test("empty edge set: every vertex is its own component") {
    check(6, Seq.empty)
  }

  test("intermediate rounds release their persisted edge sets") {
    val sc = TestSpark.spark.sparkContext
    System.gc() // let the ContextCleaner drain earlier tests' refs
    val before = sc.getPersistentRDDs.keySet
    // 64-chain needs several contraction rounds (force the
    // distributed path; the small-graph fast path runs no rounds)
    val verts = (0L until 64L).toDF("id")
    val e = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    ConnectedComponents.labels(verts, "id", e, smallGraphMaxEdges = 0L).collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    // only the FINAL round's edge set may still be pinned (the
    // returned frame references it); superseded rounds must be freed
    assert(leaked.size <= 1, s"leaked ${leaked.size} persisted round RDDs")
  }

  test("cluster summary counts members per component") {
    val verts = (0L until 10L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.clusterSummary(verts, "id", e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 3L -> 1L, 4L -> 2L, 6L -> 1L, 7L -> 1L, 8L -> 1L, 9L -> 1L))
  }
}
