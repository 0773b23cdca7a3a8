package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low `bits` bits of two non-negative
  * long columns: bit i of x lands at position 2i, bit i of y at 2i+1.
  * Sorting or range-partitioning by the z-value clusters rows that are
  * close in BOTH dimensions, so per-file min/max statistics become tight
  * on both columns at once — the data-layout primitive behind
  * multi-dimensional data skipping (a table laid out by z(l_partkey,
  * l_suppkey) prunes files for part-filtered AND supplier-filtered scans;
  * a linear sort can only serve one of the two).
  *
  * A custom expression, not a composed column: the composable form is a
  * 2·bits-term bitwise-OR tree that Catalyst neither folds nor loops —
  * measured plans blow past the codegen method-size limits at 20+ bits.
  * This is one fused loop in both interpreted and generated code.
  *
  * Inputs are masked to `bits` bits (callers map their domain to
  * non-negative ints that fit; 21 bits × 2 stays inside a positive long).
  * Null if either input is null.
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"z_value bits must be in [1, 31], got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}
