package graft

import graft.lake.{DvMask, RowSet}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RowSet (the compressed DV mask representation) in isolation:
  * membership vs a reference Set over adversarial shapes, the
  * sparse/dense/run container boundaries, and the size/build-cost
  * evidence behind the `spark.graft.dv.maskMaxRows` gate (raised 2M →
  * 8M in r10; kept at 8M in r11 — rationale in the gutted-shape test).
  */
class DvFilterSpec extends AnyFunSuite {

  private def build(rows: Array[Long]): RowSet = {
    val sorted = rows.distinct.sorted
    RowSet.fromSorted(sorted)
  }

  private def checkAgainstReference(rows: Array[Long], probesAround: Int = 3): Unit = {
    val ref = rows.toSet
    val rs = build(rows)
    rows.foreach(r => assert(rs.contains(r), s"present $r missing"))
    // probe the neighborhood of every member plus container edges
    rows.foreach { r =>
      (-probesAround to probesAround).foreach { d =>
        val p = r + d
        if (p >= 0) assert(rs.contains(p) == ref.contains(p), s"probe $p")
      }
    }
    assert(!rs.contains(-1L))
    assert(rs.cardinality == ref.size)
  }

  test("sparse container membership matches a reference set") {
    val rng = new scala.util.Random(7)
    checkAgainstReference(Array.fill(2000)(rng.nextLong(1L << 40)))
  }

  test("dense container (>=4096 in one 64k block) flips to bitmap and stays exact") {
    val rng = new scala.util.Random(11)
    // one hot block: 20k of 64k slots set, plus a sparse far block
    val hot = Array.fill(20000)((7L << 16) + rng.nextInt(1 << 16))
    val far = Array.fill(100)((123456L << 16) + rng.nextInt(1 << 16))
    checkAgainstReference(hot ++ far)
  }

  test("container edge rows (0, 65535 within a block) resolve to the right container") {
    val rows = Array(0L, 65535L, 65536L, 131071L, 131072L)
    checkAgainstReference(rows)
  }

  test("clustered deletes compress far below 8 B/row; sparse stay <= ~2 B/row") {
    // the common MoR shape: a MERGE guts a contiguous row range
    val clustered = build((0L until 1000000L).toArray)
    val flat = 8L * 1000000
    assert(clustered.sizeBytes < flat / 50,
      s"clustered ${clustered.sizeBytes} B vs flat $flat B")
    val rng = new scala.util.Random(13)
    // realistic sparse: row indexes live in [0, file row count) — a
    // big parquet file holds a few million rows, so scattered deletes
    // still land ~1-2k per 64k container (2 B each), not one-per-key
    val sparse = build(Array.fill(100000)(rng.nextLong(1L << 22)))
    assert(sparse.sizeBytes < 8L * 100000 / 3,
      s"sparse ${sparse.sizeBytes} B vs flat ${8L * 100000} B")
  }

  test("build cost at the raised 8M-row gate is sub-second") {
    val rows = (0L until (8L << 20)).toArray
    val t0 = System.nanoTime()
    val rs = RowSet.fromSorted(rows)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(rs.cardinality == (8L << 20))
    // generous bound — measured ~40-120 ms; the point is the pack is
    // not the scaling term of the mask build (the collect is)
    assert(elapsedMs < 2000, s"pack took $elapsedMs ms")
    // one contiguous 8M-row span now packs as 128 run containers
    // (4 B each), not 128 bitmaps
    assert(rs.sizeBytes <= 16 * 1024,
      s"contiguous pack should be ~runs, got ${rs.sizeBytes} B")
  }

  test("run container: mixed runs + scattered rows match a reference set") {
    val rng = new scala.util.Random(19)
    // container 3: three disjoint runs (run container); container 9:
    // scattered (sparse); container 12: dense random (bitmap); plus
    // run/edge adjacency probes via checkAgainstReference
    val rows =
      (1000L to 2000L).toArray.map((3L << 16) + _) ++
      (5000L to 5002L).toArray.map((3L << 16) + _) ++
      Array((3L << 16) + 60000L) ++
      Array.fill(300)((9L << 16) + rng.nextInt(1 << 16).toLong) ++
      Array.fill(20000)((12L << 16) + rng.nextInt(1 << 16).toLong)
    checkAgainstReference(rows)
  }

  test("gutted-file shape (full contiguous delete) is near-free: measured bytes") {
    // DELETE WHERE partition: a 4M-row file fully deleted. Flat longs
    // = 32 MB; bitmaps = 512 KB; runs = 64 containers x (8 B key +
    // 4 B run) < 2 KB. This is why the mask tier no longer fears the
    // gutted shape — though the binding term for the tier-1 gate is
    // STILL the driver collect of row indexes (8 B/row, transient),
    // which is why the gate stays at 8M rows: pruneGutted removes
    // fully-deleted files from the scan list before the gate even
    // counts them, so the gutted shape no longer consumes gate budget
    // at all, and raising the gate further would only admit bigger
    // SCATTERED masks whose collect cost is unchanged by this
    // container. Decision: keep 8M default; run container wins are in
    // shipped task-binary bytes for partially-gutted files.
    val n = 4L << 20
    val rs = build((0L until n).toArray)
    assert(rs.cardinality == n)
    assert(rs.sizeBytes < 2048, s"gutted pack ${rs.sizeBytes} B")
    // partially gutted: half the file in one contiguous span
    val half = build((0L until n by 1L).filter(_ < n / 2).toArray)
    assert(half.sizeBytes < 2048, s"half-gutted pack ${half.sizeBytes} B")
  }

  test("DvMask routes by file and misses unknown files") {
    val m = new java.util.HashMap[UTF8String, RowSet]()
    m.put(UTF8String.fromString("f1"), build(Array(1L, 5L, 9L)))
    m.put(UTF8String.fromString("f2"), build(Array(2L)))
    val mask = new DvMask(m)
    assert(mask.deleted(UTF8String.fromString("f1"), 5L))
    assert(!mask.deleted(UTF8String.fromString("f1"), 2L))
    assert(mask.deleted(UTF8String.fromString("f2"), 2L))
    assert(!mask.deleted(UTF8String.fromString("nope"), 5L))
  }

  test("RowSet and DvMask survive JVM serialization (task-binary ship)") {
    val rng = new scala.util.Random(17)
    val rows = Array.fill(5000)(rng.nextLong(1L << 30))
    val rs = build(rows)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(rs); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[RowSet]
    rows.foreach(r => assert(back.contains(r)))
    assert(back.cardinality == rs.cardinality)
  }
}
