package graft

import graft.expressions.Hex60
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: enable with
  * `spark.sql.extensions=graft.GraftExtensions` to get the engine's native
  * functions (currently `hex60`) in plain SQL on any session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hex60"),
      new ExpressionInfo("graft.expressions.Hex60", "hex60"),
      (children: Seq[Expression]) => Hex60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo("graft.expressions.DotProduct", "dot_product"),
      (children: Seq[Expression]) => graft.expressions.DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_min"),
      new ExpressionInfo("graft.expressions.WinnowMin", "winnow_min"),
      (children: Seq[Expression]) => graft.expressions.WinnowMin(children(0),
        children(1).eval().asInstanceOf[Int])))
  }
}
