package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, MapType}

/** Count-min sketch with EXPOSED counters — Spark ships
  * `count_min_sketch`, but its opaque blob only answers point queries;
  * the planning workloads a 100 TB engine actually runs need the
  * counter matrix itself, because the CMS INNER PRODUCT
  * `min_j Σ_w a[j][w]·b[j][w]` estimates a join's output cardinality
  * from two key summaries without running the join (Cormode &
  * Muthukrishnan 2005, §4.2) — the sketch behind join-size planning /
  * pre-shuffle skew detection:
  *
  *   - HARD overestimate: est ≥ |A ⋈ B| always (collisions only add);
  *   - ε-bound: est ≤ |A ⋈ B| + ε·N_A·N_B w.p. 1−δ, ε = e/width,
  *     δ = e^−depth.
  *
  * Layout: depth×width long counters, row-major, plus a 2-long header
  * (depth, width) — mixed geometries fail loudly on merge/inner.
  * Update: row j increments bucket `xxhash64(value, seed=j) mod width`.
  * Merge: element-wise add (exactly associative/commutative).
  * Deterministic end to end.
  *
  * Null rows are skipped; null sketches contribute nothing to a merge.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms_sketch depth in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 20), s"cms_sketch width in [2,2^20], got $width")

  override def prettyName: String = "cms_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash map-typed input")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](2 + depth * width)
    buf(0) = depth
    buf(1) = width
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var j = 0
      while (j < depth) {
        val h = XxHash64Function.hash(v, child.dataType, j.toLong)
        val w = (((h % width) + width) % width).toInt
        buf(2 + j * width + w) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    CmsSketch.addInto(buf, other)
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsSketch.toBytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CmsSketch.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

/** Join-size estimate from two stored CMS blobs:
  * `min_j Σ_w a[j][w]·b[j][w]`. Null if either input is null; mixed
  * geometries fail loudly. Per-bucket products are guarded against
  * silent Long overflow (Math.multiplyHigh check via Math.multiplyExact
  * — a 100 TB-side count pair can genuinely exceed 2^63). */
case class CmsInnerProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CmsSketch.inner(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ev = ev, ctx = ctx,
      f = (a, b) => s"${ev.value} = graft.functions.CmsSketch.inner($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}

object CmsSketch {

  private[functions] def addInto(buf: Array[Long], other: Array[Long]): Unit = {
    require(buf(0) == other(0) && buf(1) == other(1),
      s"cms: mixed geometries (${buf(0)}x${buf(1)} vs ${other(0)}x${other(1)})")
    var i = 2
    while (i < buf.length) {
      buf(i) = Math.addExact(buf(i), other(i))
      i += 1
    }
  }

  private[functions] def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  private[graft] def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0 && bytes.length >= 16,
      s"cms: corrupt blob (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  def inner(aBytes: Array[Byte], bBytes: Array[Byte]): Long = {
    val a = fromBytes(aBytes)
    val b = fromBytes(bBytes)
    require(a(0) == b(0) && a(1) == b(1),
      s"cms_inner: mixed geometries (${a(0)}x${a(1)} vs ${b(0)}x${b(1)})")
    val depth = a(0).toInt
    val width = a(1).toInt
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      var sum = 0L
      var w = 0
      while (w < width) {
        val i = 2 + j * width + w
        sum = Math.addExact(sum, Math.multiplyExact(a(i), b(i)))
        w += 1
      }
      if (sum < best) best = sum
      j += 1
    }
    best
  }
}
