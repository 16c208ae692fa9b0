package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-vector kernels.
  *
  * `CosineSimilarity` is a native Catalyst expression with codegen —
  * the scalar hot loop of every similarity/dedup operator. At 100 TB
  * the distance kernel runs trillions of times; a codegen'd tight
  * `double` loop stays inside whole-stage codegen, where a Scala UDF
  * (ser/de per row) or higher-order-function composition
  * (CodegenFallback) would dominate the profile.
  *
  * The reference delegates all compute to DuckDB/Databricks and has no
  * vector ops; these back the mandated extension operators
  * (SURVEY.md §7.5). Accumulation is sequential in `double`, matching
  * the oracle's `list_cosine_similarity` over `DOUBLE[]`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are always cast to array<double> by the Column wrappers
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over double arrays — same codegen posture as cosine. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs are always cast to array<double> by the Column wrappers
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Registers `graft_cosine` / `graft_dot` in the session's function
    * registry so they resolve from both the Column API (via
    * `call_function`) and SQL text.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => {
        graft.GraftExtensions.requireArity("graft_cosine", exprs, 2)
        CosineSimilarity(exprs.head, exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => {
        graft.GraftExtensions.requireArity("graft_dot", exprs, 2)
        DotProduct(exprs.head, exprs(1))
      }, "built-in")
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Cosine similarity computed in double (cast floats up first). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_cosine", asDouble(a), asDouble(b))
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", asDouble(a), asDouble(b))
  }

  /** L2 norm via built-ins (used rarely; not on the hot path). */
  def l2Norm(c: Column): Column =
    sqrt(aggregate(asDouble(c), lit(0.0), (acc, x) => acc + x * x))
}
