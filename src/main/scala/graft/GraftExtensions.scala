package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{VectorDot, ZValue}

/** Session extension wiring for the engine's custom Catalyst surface
  * (installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`): registers `vector_dot` so the
  * fused-loop expression is reachable from SQL text as well as the
  * DataFrame API ([[graft.functions.dot]]), and `z_value` (Morton
  * interleave) for multi-dimensional layout clustering.
  *
  * These two expressions are the library's only custom Catalyst code —
  * everything else in SURVEY §2 rides the built-in operator set by design
  * (§7.3): a custom expression enters only where the composable form
  * leaves per-row allocations or an unfoldable expression tree in a
  * provably hot loop.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot expects exactly 2 arguments")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValue].getName, "z_value"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "z_value expects (x, y) or (x, y, bits)")
        val bits = if (children.size == 3) children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"z_value bits must be an integer literal, got $other")
        } else 21
        ZValue(children.head, children(1), bits)
      }))
  }
}
