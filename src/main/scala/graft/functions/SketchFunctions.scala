package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Approximate distinct count as a mergeable Theta sketch — a custom
  * `TypedImperativeAggregate` over the DataSketches library that ships
  * with Spark.
  *
  * Why this shape at 100 TB: exact `count(distinct x)` shuffles every
  * distinct value; a theta sketch caps the per-group state at ~KBs,
  * merges associatively across partitions (map-side partial
  * aggregation works), and — unlike `approx_count_distinct`'s HLL —
  * sketches can later be UNIONed across groups/days or intersected,
  * which is what corpus bookkeeping pipelines do with them.
  */
case class ThetaSketchDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def prettyName: String = "graft_theta_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].toString)
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case ShortType   => buffer.update(v.asInstanceOf[Short].toLong)
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case FloatType   => buffer.update(v.asInstanceOf[Float].toDouble)
      case BinaryType  => buffer.update(v.asInstanceOf[Array[Byte]])
      case DateType    => buffer.update(v.asInstanceOf[Int].toLong)
      case TimestampType | TimestampNTZType => buffer.update(v.asInstanceOf[Long])
      case other => throw new UnsupportedOperationException(
        s"graft_theta_distinct: unsupported input type $other")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    math.round(buffer.getResult.getEstimate)

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_theta_distinct",
      exprs => {
        graft.GraftExtensions.requireArity("graft_theta_distinct", exprs, 1)
        ThetaSketchDistinct(exprs.head).toAggregateExpression()
      },
      "built-in")

  def thetaDistinct(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("graft_theta_distinct", c)
  }
}
