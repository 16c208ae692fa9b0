package graft

import graft.lake.{DvMask, RowSet}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RowSet (the compressed DV mask representation) in isolation:
  * membership vs a reference Set over adversarial shapes, the
  * sparse/dense container boundary, and the size/build-cost evidence
  * behind raising `spark.graft.dv.maskMaxRows` from 2M to 8M.
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
    val rows = (0L until (8L << 20)).toArray // worst case: all-dense pack
    val t0 = System.nanoTime()
    val rs = RowSet.fromSorted(rows)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(rs.cardinality == (8L << 20))
    // generous bound — measured ~40-120 ms; the point is the pack is
    // not the scaling term of the mask build (the collect is)
    assert(elapsedMs < 2000, s"pack took $elapsedMs ms")
    assert(rs.sizeBytes <= (8L << 20) / 8 + 16 * 1024,
      s"dense pack should be ~1 bit/row, got ${rs.sizeBytes} B")
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
