package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All `nbits` sign-LSH hyperplane bits of an `array<double>` vector in
  * ONE fused pass — bit p is `sign(v · plane_p) > 0` over the same
  * xxhash-derived deterministic planes as
  * [[graft.vector.Similarity.planeMicro]] (single source of truth: that
  * method delegates HERE, and the DuckDB oracles interpolate the same
  * exact rationals).
  *
  * Why an expression: the composable form is `nbits` independent
  * `vector_dot(v, lit(plane_p)) > 0` columns — each re-reads the
  * `ArrayData` buffer element-by-element with full per-expression
  * evaluation overhead, and at the corpus-sized geometries
  * [[graft.vector.Similarity.sizeBands]] picks (b·r bits ≈ 132 at 20 k
  * vectors) that stage alone measured 26 s of the r7 sf1 replay —
  * single-digit µs PER BIT. This expression reads each vector component
  * ONCE and accumulates into all `nbits` partial sums in a tight
  * primitive loop (dim·nbits mult-adds with sequential access into a
  * cached transposed plane matrix): the same data, ~ns per bit.
  *
  * Null semantics: null vector → null (null-intolerant); null ELEMENTS
  * contribute 0 to every accumulator, matching `vector_dot`.
  */
case class SignBits(child: Expression, nbits: Int) extends UnaryExpression {

  require(nbits > 0, s"sign_bits nbits must be positive, got $nbits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignBits.compute(input.asInstanceOf[ArrayData], nbits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.SignBits.compute($c, $nbits);")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {

  /** Integer remainders behind the planes: component j of plane p is the
    * exact rational `micro/1000 − 1/2` with
    * `micro = nonneg(xxhash64(j, xxhash64(p, 42)) mod 1000)` — uniform
    * in [0, 1000), so components are uniform in [−0.5, 0.5). The
    * NONNEGATIVE remainder matters: a bare signed `% 1000` put half the
    * components in [−1.5, −0.5], leaning every plane toward −1⃗ and
    * correlating them — giant shared-sign-pattern cones (max bucket 252
    * of 2000 vectors, ~8× the uniform-model candidate load) that the
    * oracle could never flag because it replays the same planes.
    */
  private[graft] def planeMicro(p: Int, dim: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    Array.tabulate(dim) { j =>
      val h = XxHash64Function.hash(j, IntegerType,
        XxHash64Function.hash(p, IntegerType, 42L)) % 1000L
      (h + 1000L) % 1000L
    }
  }

  // transposed plane matrix [dim][nbits], cached per geometry: planes
  // are pure functions of (dim, nbits), so one build per JVM per shape
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planesT(dim: Int, nbits: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim, nbits), { case (d, n) =>
      val byPlane = Array.tabulate(n)(p => planeMicro(p, d).map(_ / 1000.0 - 0.5))
      Array.tabulate(d)(j => Array.tabulate(n)(p => byPlane(p)(j)))
    })

  def compute(v: ArrayData, nbits: Int): ArrayData = {
    val dim = v.numElements()
    val pt = planesT(dim, nbits)
    val acc = new Array[Double](nbits)
    var j = 0
    while (j < dim) {
      if (!v.isNullAt(j)) {
        val x = v.getDouble(j)
        val row = pt(j)
        var b = 0
        while (b < nbits) { acc(b) += x * row(b); b += 1 }
      }
      j += 1
    }
    val bits = new Array[Int](nbits)
    var b = 0
    while (b < nbits) { bits(b) = if (acc(b) > 0) 1 else 0; b += 1 }
    new GenericArrayData(bits)
  }
}
