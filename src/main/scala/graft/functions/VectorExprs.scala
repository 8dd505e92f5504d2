package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for the similarity-search / dedup pipeline.
  *
  * The pipeline's hot loops (hyperplane LSH bucketing, cosine verify,
  * brute-force ANN) compute dot products over fixed-width embedding
  * arrays. Spark's higher-order functions (`aggregate(zip_with(...))`)
  * evaluate these with one closure call per element, outside whole-stage
  * codegen; a dedicated Catalyst expression with `doGenCode` keeps the
  * whole operator pipeline fused — a tight primitive loop per row. (The
  * reference engine has no vector surface; this is our Spark-first
  * extension, preference order per SURVEY: native Expression > UDF.)
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  // call sites guarantee array<double> inputs (explicit .cast at the
  // column level); no ImplicitCastInputTypes — it is private[sql]
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  // null ELEMENTS read as 0-contribution is not needed here: embedding
  // arrays are dense; containsNull inputs still evaluate (null element
  // reads as 0.0 from ArrayData), documented rather than branched-on so
  // the generated loop stays branch-free
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** dot(a, b) over array<double> columns (cast float arrays first) */
  def arrayDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
