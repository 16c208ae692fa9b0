package graft.lake

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressed sorted-set of row indexes, roaring-style: rows bucket by
  * their high bits (`row >>> 16`) into containers of 2¹⁶ slots, each
  * stored in whichever of three representations is smallest:
  *  - sorted 16-bit values (`Array[Char]`, 2 B/row) for scattered
  *    deletes;
  *  - a 1024-long bitmap (`Array[Long]`, 8 KB flat = 1 bit/slot) for
  *    dense ones;
  *  - packed runs (`Array[Int]`, `(start << 16) | endInclusive`,
  *    4 B/run) for CONTIGUOUS deletes — the DELETE-WHERE-partition /
  *    gutted-file shape, where a fully-deleted 2¹⁶-row span costs 4
  *    bytes instead of 8 KB (bitmap) or 128 KB (sparse).
  *
  * Versus the flat `Array[Long]` + binary-search representation this
  * replaces: 4× smaller for sparse deletes, up to 64× for clustered
  * ones, and ~32,000× for gutted files. Membership is one binary
  * search over container KEYS plus an O(1) bitmap probe or a ≤12-step
  * search within one container. The mask ships inside the stage's
  * task binary, so bytes here are multiplied by every executor.
  */
final class RowSet private (
    private val keys: Array[Long],
    private val containers: Array[AnyRef]) extends Serializable {

  def contains(row: Long): Boolean = {
    if (row < 0) return false
    val i = java.util.Arrays.binarySearch(keys, row >>> 16)
    if (i < 0) return false
    val lo = (row & 0xFFFF).toInt
    containers(i) match {
      case bitmap: Array[Long] =>
        (bitmap(lo >>> 6) & (1L << (lo & 63))) != 0
      case sparse: Array[Char] =>
        java.util.Arrays.binarySearch(sparse, lo.toChar) >= 0
      case runs: Array[Int] =>
        // rightmost run with start ≤ lo, then bounds check against its
        // inclusive end (runs are disjoint and sorted by start)
        var a = 0; var b = runs.length - 1; var hit = -1
        while (a <= b) {
          val m = (a + b) >>> 1
          if ((runs(m) >>> 16) <= lo) { hit = m; a = m + 1 } else b = m - 1
        }
        hit >= 0 && lo <= (runs(hit) & 0xFFFF)
    }
  }

  def cardinality: Long = {
    var t = 0L
    containers.foreach {
      case bitmap: Array[Long] => bitmap.foreach(w => t += java.lang.Long.bitCount(w))
      case sparse: Array[Char] => t += sparse.length
      case runs: Array[Int] =>
        runs.foreach(r => t += (r & 0xFFFF) - (r >>> 16) + 1)
    }
    t
  }

  /** Approximate retained bytes (array payloads; headers ignored). */
  def sizeBytes: Long = {
    var t = 8L * keys.length
    containers.foreach {
      case bitmap: Array[Long] => t += 8L * bitmap.length
      case sparse: Array[Char] => t += 2L * sparse.length
      case runs: Array[Int] => t += 4L * runs.length
    }
    t
  }
}

object RowSet {
  /** Entries per container at which the sparse array (2 B each) and
    * the flat bitmap (8 KB) cost the same.
    */
  private val DenseThreshold = 4096

  /** Builds from a SORTED, non-negative, duplicate-free index array. */
  def fromSorted(sorted: Array[Long]): RowSet = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
    val containers = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < sorted.length) {
      val hi = sorted(i) >>> 16
      var j = i
      while (j < sorted.length && (sorted(j) >>> 16) == hi) j += 1
      val n = j - i
      // count maximal consecutive runs to pick the cheapest container:
      // runs 4 B each vs sparse 2 B/row vs bitmap 8 KB flat
      var nRuns = 1
      var k = i + 1
      while (k < j) { if (sorted(k) != sorted(k - 1) + 1) nRuns += 1; k += 1 }
      val runBytes = 4L * nRuns
      if (runBytes < 2L * n && (n < DenseThreshold || runBytes < 8192L)) {
        val runs = new Array[Int](nRuns)
        var r = 0; var start = (sorted(i) & 0xFFFF).toInt
        k = i + 1
        while (k <= j) {
          if (k == j || sorted(k) != sorted(k - 1) + 1) {
            runs(r) = (start << 16) | (sorted(k - 1) & 0xFFFF).toInt
            r += 1
            if (k < j) start = (sorted(k) & 0xFFFF).toInt
          }
          k += 1
        }
        containers += runs
      } else if (n >= DenseThreshold) {
        val bitmap = new Array[Long](1024)
        k = i
        while (k < j) {
          val lo = (sorted(k) & 0xFFFF).toInt
          bitmap(lo >>> 6) |= 1L << (lo & 63)
          k += 1
        }
        containers += bitmap
      } else {
        val sparse = new Array[Char](n)
        k = i
        while (k < j) { sparse(k - i) = (sorted(k) & 0xFFFF).toChar; k += 1 }
        containers += sparse
      }
      keys += hi
      i = j
    }
    new RowSet(keys.toArray, containers.toArray)
  }
}

/** Deleted-row lookup for the DV mask scan path: file scan-path →
  * compressed row-index set ([[RowSet]]). Built ONCE driver-side per
  * descriptor set (DV parquets are immutable, so [[LakeTable]]
  * LRU-caches masks by descriptor identity) and shipped to executors
  * inside the stage's task binary — one reference, no join in the plan.
  *
  * Row cost: one UTF8String hash + the RowSet probe. Files without DVs
  * miss the map and return false, so one filter covers the whole scan.
  */
final class DvMask(m: java.util.HashMap[UTF8String, RowSet]) extends Serializable {
  def deleted(file: UTF8String, row: Long): Boolean = {
    val rs = m.get(file)
    rs != null && rs.contains(row)
  }
  private[lake] def files: Int = m.size
  private[lake] def rows: Long = {
    var t = 0L; m.values.forEach(rs => t += rs.cardinality); t
  }
  private[lake] def sizeBytes: Long = {
    var t = 0L; m.values.forEach(rs => t += rs.sizeBytes); t
  }
}

/** `DvDeleted(file_path, row_index, mask)` — true iff the mask marks
  * the row deleted. Stays inside whole-stage codegen (one static-shape
  * call through a plan reference), so a DV'd scan keeps the clean
  * scan's single codegen span; compare the two-broadcast-join plan it
  * replaces under the mask-size gate.
  */
case class DvDeleted(left: Expression, right: Expression, mask: DvMask)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dv_deleted expects (string, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_deleted"

  override protected def nullSafeEval(file: Any, row: Any): Any =
    mask.deleted(file.asInstanceOf[UTF8String], row.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDvMask", mask, classOf[DvMask].getName)
    defineCodeGen(ctx, ev, (f, r) => s"$ref.deleted($f, $r)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeleted =
    copy(left = newLeft, right = newRight)
}
