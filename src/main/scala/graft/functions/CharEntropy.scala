package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a string's CODEPOINT distribution, in integer
  * micro-bits: `round((log2 n − (Σ c·log2 c)/n) · 10⁶)` over codepoint
  * counts `c` — the classic character-entropy quality gate (very low
  * entropy ⇒ repeated-character / boilerplate junk; the rule family C4
  * and Gopher-style corpus filters apply before training).
  *
  * Why an expression: entropy needs a per-row histogram, which the
  * composable form can only build by exploding rows×chars through a
  * two-level aggregate — a corpus-sized shuffle keyed on (doc, char)
  * for a value that is row-local. This computes it in one pass over the
  * string with a small open-addressed count table, zero shuffle, inside
  * whole-stage codegen (the generated code is a single static call).
  *
  * Determinism: counts are summed in ascending-codepoint order, so the
  * result is a pure function of the string. Oracle note: DuckDB's
  * `string_split(text, '')` splits GRAPHEMES; this counts CODEPOINTS —
  * identical wherever the text has no combining sequences (all-ASCII
  * corpora trivially qualify; the gate asserts that, the Scaladoc
  * records it).
  *
  * Null → null (null-intolerant); empty string → 0.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  private val LOG2 = math.log(2.0)

  /** Entropy in micro-bits, half-away-from-zero rounded (entropy is
    * non-negative, so this is plain +0.5 floor — spelled out to match
    * DuckDB/Spark `round` semantics exactly). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0L
    // codepoint -> count, sorted map keeps the Σ c·log2 c summation
    // order a pure function of content (cross-engine micro-rounding
    // stays stable); docs have few distinct codepoints, so the tree is
    // tiny relative to the scan
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < len) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev eq null) 1L else prev + 1L)
      i += Character.charCount(cp)
      n += 1L
    }
    var clc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      clc += c * (math.log(c) / LOG2)
    }
    val h = math.log(n.toDouble) / LOG2 - clc / n
    math.floor(h * 1e6 + 0.5).toLong
  }
}
