package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over array columns — the inner loop of every
  * similarity operator (millions of 64-float pairs per query). Spark's
  * higher-order `zip_with` + `aggregate` chain is evaluated interpreted,
  * one closure call per element with boxed accumulators; this expression is
  * one codegen'd call running a primitive loop. Accumulation order is the
  * same strict left-to-right fold, so results are bit-identical to the
  * column-chain version (and to DuckDB's `list_dot_product`).
  *
  * Accepts `array<double>` and `array<float>` (floats widen exactly, so
  * callers can skip a whole cast-transform pass over the corpus).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (isFloat(left)) DotProduct.evalF(x, y) else DotProduct.evalD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat(left)) "evalF" else "evalD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.DotProduct.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def evalD(x: ArrayData, y: ArrayData): Double = {
    val xs = x.toDoubleArray()
    val ys = y.toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i) * ys(i); i += 1 }
    s
  }

  def evalF(x: ArrayData, y: ArrayData): Double = {
    val xs = x.toFloatArray()
    val ys = y.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i).toDouble * ys(i).toDouble; i += 1 }
    s
  }

  private val registered = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    registered.computeIfAbsent(String.valueOf(System.identityHashCode(spark)), _ => {
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.expressions.DotProduct", "dot_product"),
        (children: Seq[Expression]) => DotProduct(children(0), children(1)))
      java.lang.Boolean.TRUE
    })

  def apply(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(ensureRegistered)
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
  }
}
