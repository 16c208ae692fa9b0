package graft.lake

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deleted-row lookup for the DV mask scan path: file scan-path →
  * sorted row indexes. Built ONCE driver-side per descriptor set (DV
  * parquets are immutable, so [[LakeTable]] LRU-caches masks by
  * descriptor identity) and shipped to executors inside the stage's
  * task binary — one reference, no join in the plan.
  *
  * Row cost: one UTF8String hash + binary search. Files without DVs
  * miss the map and return false, so one filter covers the whole scan.
  */
final class DvMask(m: java.util.HashMap[UTF8String, Array[Long]]) extends Serializable {
  def deleted(file: UTF8String, row: Long): Boolean = {
    val arr = m.get(file)
    arr != null && java.util.Arrays.binarySearch(arr, row) >= 0
  }
  private[lake] def files: Int = m.size
  private[lake] def rows: Long = {
    var t = 0L; m.values.forEach(a => t += a.length); t
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
