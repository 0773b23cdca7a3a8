package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, MapType}

/** HyperLogLog as a PERSISTABLE sketch column — the pre-aggregated
  * materialized-view pattern that makes distinct counting tractable at
  * 100 TB: per-partition (per-day, per-shard) sketches are stored as a
  * `binary` register block and later MERGED across any range with no
  * rescan of the underlying rows. Spark's built-in
  * `approx_count_distinct` computes-and-collapses in one job; it cannot
  * hand the registers to a table. This trio can:
  *
  *   - [[HllSketch]]  (agg)    rows   → binary registers, `2^p` bytes
  *   - [[HllUnion]]   (agg)    binary → binary (element-wise max)
  *   - [[HllCount]]   (scalar) binary → bigint estimate
  *
  * Register update is `max`, which is associative, commutative and
  * idempotent — so a sketch of a union equals the union of sketches
  * BIT-FOR-BIT, regardless of partitioning, merge-tree shape, or
  * double-counting (retries/replays are absorbed). That identity is an
  * assertable contract (q192 gates it literally), far stronger than an
  * accuracy band.
  *
  * Estimator (Flajolet et al. 2007): `E = α_m · m² / Σ 2^−M[j]` with
  * the small-range linear-counting correction `m·ln(m/V)` when
  * `E ≤ 2.5m` and empty registers remain. Deterministic: xxhash64
  * (seed 42) like every other fingerprint in the engine, fixed
  * double-op chain, floor to long. Standard error ≈ 1.04/√m — the q192
  * envelope asserts a 5σ band, the [[graft.operators.Sketches]]
  * discipline.
  *
  * Null semantics: null rows are skipped (match approx_count_distinct);
  * a null sketch contributes nothing to a union; HllCount(null) → null.
  */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_sketch precision must be in [4, 16], got $p")

  override def prettyName: String = "hll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash map-typed input")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      // rank = leading zeros of the remaining 64−p bits, +1; all-zero
      // remainder saturates at 64−p+1
      val rest = h << p
      val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllSketch.maxInto(buf, other, prettyName)
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

/** Element-wise max of stored [[HllSketch]] register blocks: the range
  * merge. Mixed precisions fail loudly (a silent truncation would
  * corrupt every estimate downstream). Null sketches are skipped; an
  * all-null/empty group yields an empty (zero-length) sketch, which
  * [[HllCount]] maps to 0.
  */
case class HllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def prettyName: String = "hll_union"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary sketches, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      // InternalRow binary may be a reused buffer — copy on first adopt
      val arr = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) arr.clone()
      else { HllSketch.maxInto(buf, arr, prettyName); buf }
    }
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else { HllSketch.maxInto(buf, other, prettyName); buf }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllUnion =
    copy(child = newChild)
}

/** Register-wise max of TWO sketch columns as a scalar expression —
  * the pairwise union for sketch algebra (overlap via
  * inclusion–exclusion) without forcing a per-pair explode through the
  * [[HllUnion]] aggregate. Null if either side is null; mixed
  * precisions fail loudly. */
case class HllMerge2(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HllSketch.merged(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.HllSketch.merged($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllMerge2 =
    copy(left = newLeft, right = newRight)
}

/** Cardinality estimate of a stored register block (scalar, codegen'd
  * as one static call). Empty sketch → 0; null → null. */
case class HllCount(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary sketches, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HllSketch.estimate(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.HllSketch.estimate($c);")

  override protected def withNewChildInternal(newChild: Expression): HllCount =
    copy(child = newChild)
}

object HllSketch {

  /** Element-wise max of `other` into `buf`; lengths must match (same
    * precision) — fail loudly otherwise. */
  private[functions] def maxInto(buf: Array[Byte], other: Array[Byte],
                                 op: String): Unit = {
    require(buf.length == other.length,
      s"$op: mixed sketch precisions (${buf.length} vs ${other.length} registers)")
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
  }

  /** Fresh register block holding the element-wise max of two sketches
    * (neither input mutated — scan buffers may be reused). */
  def merged(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = a.clone()
    maxInto(out, b, "hll_merge2")
    out
  }

  /** Flajolet α_m bias constant. */
  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  def estimate(registers: Array[Byte]): Long = {
    val m = registers.length
    if (m == 0) return 0L
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i)
      invSum += java.lang.Math.pow(2.0, -r.toDouble)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha(m) * m.toDouble * m.toDouble / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.floor(corrected).toLong
  }
}
