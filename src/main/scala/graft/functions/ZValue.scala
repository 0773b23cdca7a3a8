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


/** N-dimensional Morton (Z-order) interleave — [[ZValue]] generalized
  * from 2 columns to any column list (Delta's `OPTIMIZE ZORDER BY
  * (a, b, c, ...)` shape): bit i of dimension d lands at position
  * `i * n + d`, so for n = 2 the code is BIT-IDENTICAL to [[ZValue]]
  * (dimension 0 on even bits, dimension 1 on odd — the 2-d gates stay
  * pinned). Same fused-loop rationale as [[ZValue]]: the composable
  * OR-tree form is n·bits terms that Catalyst neither folds nor loops.
  *
  * `n * bits` must fit a positive long (n·bits <= 63); inputs are
  * domain-checked by callers (see Versioned.optimize) and masked to
  * `bits` bits here. Null if any input is null.
  */
case class ZValueN(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.size >= 2,
    s"z_value_n needs at least 2 dimensions, got ${children.size}")
  require(bits >= 1 && children.size * bits <= 63,
    s"z_value_n: ${children.size} dims x $bits bits must fit a positive " +
      s"long (n*bits <= 63), got ${children.size * bits}")

  private def n = children.size

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value_n"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < n) {
      val v = children(d).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1L) << (i * n + d)
        i += 1
      }
      d += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val z = ctx.freshName("z")
    // one guarded block per dimension: evaluate the child, bail to null
    // on a null input, otherwise OR its bits into the shared code
    def dimBlock(nullFlag: String): String =
      children.map(_.genCode(ctx)).zipWithIndex.map { case (e, d) =>
        val i = ctx.freshName("i")
        val nullCheck =
          if (e.isNull.toString == "false") ""
          else s"if (${e.isNull}) { $nullFlag = true; } else"
        s"""
           |if (!$nullFlag) {
           |  ${e.code}
           |  $nullCheck {
           |    for (int $i = 0; $i < $bits; $i++) {
           |      $z |= ((${e.value} >> $i) & 1L) << ($i * $n + $d);
           |    }
           |  }
           |}
         """.stripMargin
      }.mkString("\n")
    if (nullable) {
      val body = dimBlock(ev.isNull.toString)
      ev.copy(code =
        code"""
           |boolean ${ev.isNull} = false;
           |long $z = 0L;
           |$body
           |long ${ev.value} = $z;
         """.stripMargin)
    } else {
      val body = dimBlock("false")
      // no input can be null: the guard folds to if (!false) {...}
      ev.copy(code =
        code"""
           |long $z = 0L;
           |$body
           |long ${ev.value} = $z;
         """.stripMargin,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueN =
    copy(children = newChildren)
}
