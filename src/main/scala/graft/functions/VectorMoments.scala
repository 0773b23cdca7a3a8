package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** First and second moments of an `array<double>` vector column as ONE
  * mergeable constant-size aggregate: count `n`, per-dimension sums
  * `s[d]`, and the upper triangle of the raw outer-product sums
  * `s2[d(d+1)/2]` (row-major, `s2[idx(i,j)] = Σ v_i·v_j`, j ≥ i).
  *
  * This is the distributed half of classical PCA / feature
  * standardization (the same split Spark MLlib's
  * `RowMatrix.computeGramianMatrix` makes — public API, not internal):
  * the data-sized work is an associative per-partition accumulation
  * into a d + d(d+1)/2 double buffer (~17 KB at d = 64), ONE narrow row
  * crosses the wire per partition wherever AQE places the merge, and
  * everything downstream (covariance, eigensolve, z-scores) is O(d²)
  * metadata math. The alternative — posexplode to (row, dim) pairs and
  * shuffle-aggregate — puts rows×d records through the hash aggregate;
  * this buffer never grows past d(d+3)/2 doubles no matter the corpus.
  *
  * Null semantics: null VECTORS are skipped (don't count toward n);
  * null ELEMENTS contribute 0, matching [[VectorDot]]. Ragged
  * dimensions fail loudly — moments across mixed-dim vectors are
  * meaningless and a silent min-dim would corrupt every statistic.
  *
  * Output: struct<n: bigint, s: array<double>, s2: array<double>>.
  */
case class VectorMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorMoments.Buf]
    with UnaryLike[Expression] {

  override def prettyName: String = "vector_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("s2", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VectorMoments.Buf =
    new VectorMoments.Buf(0L, null, null)

  override def update(buf: VectorMoments.Buf, input: InternalRow): VectorMoments.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val d = arr.numElements()
      // d = 0 would make s a zero-length array — the same shape the
      // serialize round-trip uses as the "untouched buffer" sentinel, so
      // a deserialized partial would carry n > 0 with s == null and
      // merge() would silently drop its count (ADVICE r8). Moments of a
      // zero-dimension vector are meaningless anyway: refuse loudly.
      require(d > 0, "vector_moments: zero-dimension (empty) vector")
      if (buf.s == null) {
        buf.s = new Array[Double](d)
        buf.s2 = new Array[Double](d * (d + 1) / 2)
      } else require(buf.s.length == d,
        s"vector_moments: ragged dimensions (${buf.s.length} vs $d)")
      // pull the vector into a local array once: s2 reads each component
      // d/2 times and ArrayData element access is not free
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i); i += 1 }
      var k = 0
      i = 0
      while (i < d) {
        buf.s(i) += x(i)
        var j = i
        while (j < d) { buf.s2(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      buf.n += 1L
    }
    buf
  }

  override def merge(buf: VectorMoments.Buf, other: VectorMoments.Buf): VectorMoments.Buf = {
    if (other.s != null) {
      if (buf.s == null) { buf.n = other.n; buf.s = other.s; buf.s2 = other.s2 }
      else {
        require(buf.s.length == other.s.length,
          s"vector_moments: ragged dimensions across partials " +
            s"(${buf.s.length} vs ${other.s.length})")
        buf.n += other.n
        var i = 0
        while (i < buf.s.length) { buf.s(i) += other.s(i); i += 1 }
        i = 0
        while (i < buf.s2.length) { buf.s2(i) += other.s2(i); i += 1 }
      }
    }
    buf
  }

  override def eval(buf: VectorMoments.Buf): Any = {
    val s = if (buf.s == null) Array.empty[Double] else buf.s
    val s2 = if (buf.s2 == null) Array.empty[Double] else buf.s2
    InternalRow(buf.n, new GenericArrayData(s), new GenericArrayData(s2))
  }

  private lazy val projection = UnsafeProjection.create(Array[DataType](
    LongType,
    ArrayType(DoubleType, containsNull = false),
    ArrayType(DoubleType, containsNull = false)))

  override def serialize(buf: VectorMoments.Buf): Array[Byte] =
    projection.apply(InternalRow(
      buf.n,
      new GenericArrayData(if (buf.s == null) Array.empty[Double] else buf.s),
      new GenericArrayData(if (buf.s2 == null) Array.empty[Double] else buf.s2))).getBytes

  override def deserialize(bytes: Array[Byte]): VectorMoments.Buf = {
    val row = new UnsafeRow(3)
    row.pointTo(bytes, bytes.length)
    val s = row.getArray(1).toDoubleArray()
    val s2 = row.getArray(2).toDoubleArray()
    new VectorMoments.Buf(row.getLong(0),
      if (s.isEmpty) null else s, if (s2.isEmpty) null else s2)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMoments =
    copy(child = newChild)
}

object VectorMoments {
  /** Mutable partial: `s`/`s2` stay null until the first vector fixes
    * the dimensionality (so empty partitions merge as identity). */
  final class Buf(var n: Long, var s: Array[Double], var s2: Array[Double])

  /** Flattened upper-triangle index of (i, j), i ≤ j, for dimension d:
    * row i starts at i·d − i(i−1)/2. */
  def triIdx(i: Int, j: Int, d: Int): Int = {
    require(i <= j && j < d, s"triIdx($i, $j, $d)")
    i * d - i * (i - 1) / 2 + (j - i)
  }
}
