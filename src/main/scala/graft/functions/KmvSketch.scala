package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, MapType}

/** KMV / theta sketch — the k minimum DISTINCT hash values of a key
  * column. The HLL register block ([[HllSketch]]) answers
  * cardinalities and unions, but inclusion–exclusion is all it has for
  * an intersection, and IE error scales with the UNION size — useless
  * when the overlap is small. A KMV sketch carries an actual uniform
  * sample of the key space (every hash below the threshold
  * θ = k-th smallest), so intersections and differences are answered
  * DIRECTLY by set algebra on the samples (Beyer et al., SIGMOD 2007;
  * the theta-sketch framework of Dasgupta et al. 2016):
  *
  *   - estimate:   |A| ≈ (k−1)/θ_A  (exact count while < k values)
  *   - intersect:  θ = min(θ_A, θ_B); |A∩B| ≈ |{x ∈ S_A∩S_B : x < θ}|/θ
  *   - difference: |A∖B| ≈ |{x ∈ S_A, x ∉ S_B : x < θ}|/θ
  *
  * Keep-k-smallest-distinct is associative, commutative and IDEMPOTENT,
  * so — exactly like the HLL registers — a sketch of a union equals the
  * union of sketches BIT-FOR-BIT regardless of partitioning, merge-tree
  * shape or replay double-counting; q200 gates that identity literally.
  * RSE of the full-sketch estimator is ≈ 1/√(k−2).
  *
  * Layout: `[k: Long][n: Long][n ascending unsigned hash values]`,
  * n ≤ k. Hashing is xxhash64(seed 42) with UNSIGNED ordering — the
  * engine-wide fingerprint discipline. Mixed-k blobs fail loudly.
  * Null rows are skipped; a null blob contributes nothing to a merge.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 16 && k <= (1 << 16), s"kmv_sketch k must be in [16, 65536], got $k")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot hash map-typed input")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvSketch.UnsignedOrder)

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      KmvSketch.offer(buf, XxHash64Function.hash(v, child.dataType, 42L), k)
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.offer(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvSketch.toBytes(buf, k)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketch.toBytes(buf, k)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val (kk, vals) = KmvSketch.fromBytes(bytes)
    require(kk == k, s"$prettyName: mixed k ($kk vs $k)")
    val set = createAggregationBuffer()
    vals.foreach(set.add(_))
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** Union of two stored KMV blobs (keep k smallest distinct) as a scalar
  * expression — pairwise sketch algebra without re-aggregating. Null if
  * either side is null; mixed k fails loudly. */
case class KmvMerge2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_merge2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.merged(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.KmvSketch.merged($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvMerge2 =
    copy(left = newLeft, right = newRight)
}

/** Cardinality estimate of a stored KMV blob: exact count while the
  * sketch never filled; (k−1)/θ once it did. Null → null. */
case class KmvCount(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary sketch, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    KmvSketch.estimate(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.KmvSketch.estimate($c);")

  override protected def withNewChildInternal(newChild: Expression): KmvCount =
    copy(child = newChild)
}

/** Direct |A∩B| estimate from two stored KMV blobs — the operation HLL
  * fundamentally can't do without inclusion–exclusion. Null if either
  * side is null. */
case class KmvIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.KmvSketch.intersectEstimate($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}

/** Direct |A∖B| estimate from two stored KMV blobs. Null if either side
  * is null. */
case class KmvDifference(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_difference"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two binary sketches, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.differenceEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.KmvSketch.differenceEstimate($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvDifference =
    copy(left = newLeft, right = newRight)
}

object KmvSketch {

  /** Empty blob for a given k — the fold seed for merge2 reductions. */
  def empty(k: Int): Array[Byte] =
    toBytes(new java.util.TreeSet[java.lang.Long](UnsignedOrder), k)

  private[functions] val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  /** Insert `h` keeping only the k smallest distinct values. */
  private[functions] def offer(set: java.util.TreeSet[java.lang.Long],
                               h: Long, k: Int): Unit = {
    if (set.size() < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0 && set.add(h)) {
      set.remove(set.last()); ()
    }
  }

  private[functions] def toBytes(set: java.util.TreeSet[java.lang.Long], k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + set.size() * 8)
    bb.putLong(k.toLong).putLong(set.size().toLong)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  /** (k, ascending unsigned values). */
  private[graft] def fromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    require(bytes.length >= 16 && bytes.length % 8 == 0,
      s"kmv: corrupt blob (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getLong.toInt
    val n = bb.getLong.toInt
    require(n >= 0 && n <= k && bytes.length == 16 + n * 8,
      s"kmv: corrupt blob (k=$k n=$n len=${bytes.length})")
    (k, Array.fill(n)(bb.getLong))
  }

  /** Normalized k-th smallest hash in (0, 1]; 1.0 while not full (the
    * sample IS the whole set). Top 53 bits → exact double. */
  private def theta(k: Int, vals: Array[Long]): Double =
    if (vals.length < k) 1.0
    else (vals(vals.length - 1) >>> 11).toDouble / (1L << 53).toDouble

  def merged(aBytes: Array[Byte], bBytes: Array[Byte]): Array[Byte] = {
    val (ka, a) = fromBytes(aBytes)
    val (kb, b) = fromBytes(bBytes)
    require(ka == kb, s"kmv_merge2: mixed k ($ka vs $kb)")
    val set = new java.util.TreeSet[java.lang.Long](UnsignedOrder)
    a.foreach(offer(set, _, ka))
    b.foreach(offer(set, _, ka))
    toBytes(set, ka)
  }

  def estimate(bytes: Array[Byte]): Long = {
    val (k, vals) = fromBytes(bytes)
    if (vals.length < k) vals.length.toLong
    else math.round((k - 1).toDouble / theta(k, vals))
  }

  /** Samples of BOTH sides below min(θ_A, θ_B), scaled back by θ. */
  def intersectEstimate(aBytes: Array[Byte], bBytes: Array[Byte]): Long =
    setOpEstimate(aBytes, bBytes, keepInB = true)

  /** Samples of A absent from B below min(θ_A, θ_B), scaled back. */
  def differenceEstimate(aBytes: Array[Byte], bBytes: Array[Byte]): Long =
    setOpEstimate(aBytes, bBytes, keepInB = false)

  private def setOpEstimate(aBytes: Array[Byte], bBytes: Array[Byte],
                            keepInB: Boolean): Long = {
    val (ka, a) = fromBytes(aBytes)
    val (kb, b) = fromBytes(bBytes)
    require(ka == kb, s"kmv set op: mixed k ($ka vs $kb)")
    val th = math.min(theta(ka, a), theta(kb, b))
    val bSet = new java.util.HashSet[java.lang.Long](b.length * 2)
    b.foreach(bSet.add(_))
    var count = 0L
    var i = 0
    while (i < a.length) {
      val below =
        th == 1.0 || (a(i) >>> 11).toDouble / (1L << 53).toDouble < th
      if (below && bSet.contains(a(i)) == keepInB) count += 1
      i += 1
    }
    math.round(count / th)
  }
}
