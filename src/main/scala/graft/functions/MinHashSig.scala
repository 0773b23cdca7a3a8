package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused k-view MinHash signature over an `array<string>` shingle column.
  *
  * Semantics: `sig[i] = min over shingles s of h_i(s)` where
  * `h_i(x) = xxhash64(x) * A_i + B_i` — one strong base hash per shingle
  * plus k multiply-shift views (odd multipliers, a 2-universal family).
  * This is the standard one-permutation-per-view MinHash construction;
  * min-stability (`sig(S ∪ T) = element-min(sig(S), sig(T))`) and the
  * collision property `P[sig_i(S) = sig_i(T)] ≈ J(S, T)` hold exactly as
  * for k independent hashes.
  *
  * Why an expression and not the composable form: computing the same
  * signature relationally takes `explode(shingles)` (N×|shingles| rows
  * through the pipeline), k full `xxhash64` evaluations per occurrence,
  * and a k-column min-aggregate shuffle. Here the signature is a purely
  * row-local function of one document's shingle set: one pass over the
  * array, ONE byte-level hash per shingle, k multiply-adds per view, no
  * explode, no aggregation, no shuffle. At 10⁹ documents this turns the
  * signature stage from the dominant shuffle into a projection.
  *
  * Null semantics: null input → null; null ELEMENTS are skipped; an empty
  * array (a document too short to shingle) → null, so such docs drop out
  * of banding exactly as they produce no rows in an inverted index.
  *
  * Beyond-reference operator (reference ROADMAP.md:85–90 points at
  * similarity infrastructure; the reference itself has no dedup surface).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the loop lives in one compiled static method — a single call per
      // row from generated code, no per-element expression dispatch
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Seed of the per-shingle base hash (Spark's conventional default). */
  val BaseSeed = 42L

  // k (odd multiplier, offset) pairs, derived deterministically from the
  // view index so signatures are reproducible across sessions/executors
  private val coeffCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** The k (odd multiplier, offset) view pairs — shared with
    * [[MinHashSigNgrams]] so both forms emit identical signatures. */
  private[functions] def viewCoeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, (kk: Int) => {
      val a = new Array[Long](kk)
      val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = XXH64.hashLong(2L * i + 1, 0x9E3779B97F4A7C15L) | 1L
        b(i) = XXH64.hashLong(2L * i + 2, 0xC2B2AE3D27D4EB4FL)
        i += 1
      }
      (a, b)
    })

  /** One pass over the shingle array; returns null for an empty set. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val (as, bs) = viewCoeffs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var sawValue = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        sawValue = true
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), BaseSeed)
        var i = 0
        while (i < k) {
          val v = h * as(i) + bs(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!sawValue) null else new GenericArrayData(mins)
  }
}
