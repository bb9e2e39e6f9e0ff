package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 60-bit hash:
  * numerically identical to `conv(substring(md5(x), 1, 15), 16, 10)` (and to
  * DuckDB's `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), but evaluated as
  * one codegen'd call — no hex-string round trip, no string slicing, and a
  * thread-local digest instance. This is the hot inner hash of every dedup /
  * fingerprint operator (millions of evaluations per batch), which is why it
  * earns a custom `Expression` rather than a composed column chain.
  */
case class Hex60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hex60"

  protected override def nullSafeEval(input: Any): Any =
    Hex60.hash60(input.asInstanceOf[UTF8String])

  // The static helper must NOT be named `eval`: a companion-object method whose
  // name collides with an inherited member gets no static forwarder, so the
  // generated Java would resolve to Expression.eval(InternalRow) and fail to
  // compile — silently dropping the whole stage to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hex60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hex60 = copy(child = newChild)
}

object Hex60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits (60 bits) of md5(bytes) as a non-negative long. */
  def hash60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  private val registered = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Register `hex60` in the session's function registry (idempotent). Also
    * injectable at session build time via [[graft.GraftExtensions]].
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    registered.computeIfAbsent(String.valueOf(System.identityHashCode(spark)), _ => {
      spark.sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hex60"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.expressions.Hex60", "hex60"),
        (children: Seq[Expression]) => Hex60(children.head))
      java.lang.Boolean.TRUE
    })

  /** Column API entry point (requires an active session to resolve). */
  def apply(c: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(ensureRegistered)
    org.apache.spark.sql.functions.call_function("hex60", c)
  }
}
