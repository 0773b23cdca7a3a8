package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused 60-bit SimHash fingerprint over an `array<string>` token column.
  *
  * Bit-identical to the relational definition used by the DuckDB oracle
  * (graft.text.Dedup q27): per token,
  * `h = conv(substring(md5(token), 1, 15), 16, 10)` — the top 15 hex
  * digits of md5 as an unsigned 60-bit value — then per bit position i,
  * `sum_i += (h >> i) & 1 == 1 ? +1 : -1` over ALL token occurrences
  * (duplicates included), and the fingerprint sets bit i iff `sum_i > 0`.
  *
  * Why an expression: the relational form explodes every token occurrence
  * into a row and aggregates 60 conditional-sum columns — 60 CASE WHEN
  * evaluations per token through a wide groupBy shuffle. The fingerprint
  * is a purely row-local function of one document's token array: this
  * expression computes it in one pass (one md5 per token, 60 integer ops)
  * with no explode and no aggregation. The md5 digest is reused via a
  * thread-local, so no per-row allocation.
  *
  * Null semantics: null input → null; null elements skipped; an empty
  * array yields fingerprint 0 (no evidence on any bit).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Fingerprint width — 60 bits = 15 md5 hex digits, the widest md5
    * prefix that stays inside a signed 64-bit long (see
    * [[graft.text.Dedup.SimhashBits]]). */
  val Bits = 60

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes): bytes 0–6 in full plus the high nibble of
    * byte 7 — exactly `conv(substring(md5(x), 1, 15), 16, 10)`. */
  def tokenHash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def compute(arr: ArrayData): Long = {
    val sums = new Array[Int](Bits)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = tokenHash60(arr.getUTF8String(j).getBytes)
        var i = 0
        while (i < Bits) {
          sums(i) += (((h >>> i) & 1L).toInt << 1) - 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < Bits) {
      if (sums(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }
}
