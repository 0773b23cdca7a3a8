package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined n-token shingles of an `array<string>` column,
  * first-occurrence order — byte-identical to the composable form
  * `array_distinct(transform(sequence(0, size(t) - n),
  * i -> concat_ws(' ', t[i], …, t[i+n-1])))` including `concat_ws` null
  * skipping, but one compiled pass with a hash-set dedup instead of an
  * interpreted lambda per window plus an O(m²)-ish distinct over the
  * materialized array.
  *
  * A document too short to shingle (fewer than n tokens) yields an EMPTY
  * array, matching the `when(size >= n, …).otherwise(array())` guard the
  * relational form needs (`sequence(0, negative)` would throw).
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NGrams.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.NGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {

  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return Empty
    val parts = new Array[UTF8String](2 * n - 1)
    val seen = new java.util.HashSet[UTF8String]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    while (w + n <= m) {
      // concat_ws semantics: null tokens are skipped, separators join
      // only the non-null parts
      var np = 0
      var j = 0
      while (j < n) {
        if (!toks.isNullAt(w + j)) {
          if (np > 0) { parts(np) = Space; np += 1 }
          parts(np) = toks.getUTF8String(w + j)
          np += 1
        }
        j += 1
      }
      val s = UTF8String.concat(java.util.Arrays.copyOfRange(parts, 0, np): _*)
      if (seen.add(s)) out += s
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
