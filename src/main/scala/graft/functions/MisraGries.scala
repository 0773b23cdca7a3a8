package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StructType}

/** Misra–Gries heavy-hitter summary as a MERGEABLE constant-memory
  * aggregate: at most `k` counters per buffer, ever — the deterministic
  * complement to count-min (q67): count-min overestimates with a
  * probabilistic bound over random hashes; Misra–Gries underestimates
  * with a HARD bound and no randomness at all.
  *
  * Guarantees (Misra & Gries 1982; merge rule and its preserved bound
  * per Agarwal et al., "Mergeable Summaries", PODS 2012): after any
  * tree of partial aggregations over n rows,
  *
  *   - every reported estimate undercounts: est ≤ true;
  *   - the deficit is bounded: true − est ≤ n / (k+1);
  *   - hence every item with true frequency > n / (k+1) IS in the
  *     summary — the presence guarantee q154's envelope oracle pins.
  *
  * update: increment a live counter, else claim a free slot, else
  * decrement all k counters (dropping zeros) — the classic O(k)
  * eviction, amortized O(1) per row. merge: sum counters; if over k,
  * subtract the (k+1)-th largest count from all and drop non-positive —
  * each such subtraction is ≤ the mass both sides already absorbed, so
  * deficits ADD to at most n/(k+1) across any merge tree.
  *
  * 100 TB shape: the whole point — a k-entry map per partial buffer
  * regardless of input size or distinct count, one narrow row crossing
  * the wire per partition, associative merge anywhere AQE places it.
  * Output: map<item, est> (≤ k entries).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"misra_gries k must be positive, got $k")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  /** Same map-type rejection as [[BoundedCollectSet]]: MapData has no
    * value-based equality, so map-typed items would never match their
    * own counter. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    if (hasMap(child.dataType))
      TypeCheckResult.TypeCheckFailure("misra_gries() cannot have map type data")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[Any, Long],
                      input: InternalRow): mutable.HashMap[Any, Long] = {
    val value = child.eval(input)
    if (value != null) {
      buffer.get(value) match {
        case Some(c) => buffer.update(value, c + 1L)
        case None if buffer.size < k =>
          // copy: non-primitive eval results are backed by scan-reused buffers
          buffer.update(InternalRow.copyValue(value), 1L)
        case None =>
          // decrement-all eviction; the arriving item's single count is
          // absorbed by the same decrement
          val dead = buffer.iterator.collect { case (v, 1L) => v }.toList
          dead.foreach(buffer.remove)
          buffer.keysIterator.toList.foreach(v => buffer.update(v, buffer(v) - 1L))
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[Any, Long],
                     other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (v, c) =>
      buffer.update(v, buffer.getOrElse(v, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count from every counter
      val cut = buffer.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = buffer.iterator.collect { case (v, c) if c <= cut => v }.toList
      dead.foreach(buffer.remove)
      buffer.keysIterator.toList.foreach(v => buffer.update(v, buffer(v) - cut))
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Any, Long]): Any = {
    val entries = buffer.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))
  }

  private lazy val projection = UnsafeProjection.create(Array[DataType](
    ArrayType(child.dataType, containsNull = false),
    ArrayType(LongType, containsNull = false)))

  override def serialize(buffer: mutable.HashMap[Any, Long]): Array[Byte] = {
    val entries = buffer.toArray
    projection.apply(InternalRow.apply(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val buffer = createAggregationBuffer()
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val keys = row.getArray(0)
    val counts = row.getArray(1)
    keys.foreach(child.dataType,
      (idx, value: Any) => buffer.update(value, counts.getLong(idx)))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
