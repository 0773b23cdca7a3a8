package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity of two string columns (Winkler 1990: Jaro
  * similarity plus a common-prefix boost of `0.1 · min(prefix, 4) ·
  * (1 − jaro)`, applied only when `jaro > 0.7`) — the classic
  * record-linkage scorer for short identifier-ish strings (names, vocab
  * tokens), where edit distance is too coarse (it has no notion of
  * transposition or prefix agreement).
  *
  * Why an expression: Spark ships `levenshtein` but no Jaro–Winkler, and
  * the similarity sits in the inner loop of a blocked linkage join —
  * every candidate pair is scored. The implementation is one fused pass
  * over the two UTF8String byte buffers with two small local bitsets, in
  * both interpreted and generated code; whole-stage codegen keeps the
  * filter on the score inside the same generated loop as the block join.
  *
  * Semantics are byte-level (exact for ASCII input, which is what the
  * lower-cased `[a-z]+` vocabulary guarantees) and match the oracle
  * engine's `jaro_winkler_similarity`: match window
  * `max(⌊max(|a|,|b|)/2⌋ − 1, 0)`, transpositions counted as
  * `⌊out-of-order matches / 2⌋` (floored, verified against the oracle on
  * an odd-count case), and either side empty → 0.0 (including both —
  * the oracle's convention, not the usual 1.0).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two string arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private final val PrefixScale = 0.1
  private final val PrefixCap = 4
  private final val BoostThreshold = 0.7

  /** Byte-level Jaro–Winkler in [0, 1]. Called from generated code. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes()
    val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0.0
    val j = jaro(a, la, b, lb)
    if (j <= BoostThreshold) return j
    var p = 0
    val maxP = math.min(PrefixCap, math.min(la, lb))
    while (p < maxP && a.getByte(p) == b.getByte(p)) p += 1
    j + p * PrefixScale * (1.0 - j)
  }

  private def jaro(a: UTF8String, la: Int, b: UTF8String, lb: Int): Double = {
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    // bitsets over positions; identifier-ish strings are short, so the
    // two long-arrays live in the nursery and the loops stay primitive
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, lb)
      var k = lo
      var done = false
      while (k < hi && !done) {
        if (!bMatch(k) && a.getByte(i) == b.getByte(k)) {
          aMatch(i) = true
          bMatch(k) = true
          m += 1
          done = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0 // out-of-order matched pairs (transpositions = t / 2)
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }
}
