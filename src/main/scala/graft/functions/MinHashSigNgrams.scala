package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** MinHash signature of a document's n-token shingle SET, computed
  * straight from the TOKEN array — `minhash_sig(ngrams(toks, n), k)`
  * without ever materializing a shingle string: each window's bytes are
  * assembled into a reused thread-local buffer (token bytes joined by a
  * single space, `concat_ws` null-skipping included), hashed once with
  * xxhash64, and folded into the k running minima via the same
  * multiply-shift views as [[MinHashSig]] — signatures are bit-identical
  * to the two-step form.
  *
  * Duplicate windows need no dedup: min over a multiset equals min over
  * its set, so the distinct pass the string form requires disappears.
  * This is the corpus-side signature operator: at 10⁹ documents the
  * signature stage is one streaming projection over the token arrays,
  * with shingle ARRAYS materialized only later and only for the (tiny)
  * LSH candidate set.
  *
  * Null semantics: null input → null; a document with fewer than n
  * tokens (no windows at all) → null, so it drops out of banding
  * exactly like a doc with no inverted-index rows. A window whose
  * tokens are all null hashes as the EMPTY shingle — matching what
  * `concat_ws` produces in the two-step `minhash_sig(ngrams(...))`
  * form, which is the bit-identity contract (asserted in
  * FusedFingerprintSpec).
  */
case class MinHashSigNgrams(child: Expression, n: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_ngrams"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n > 0 and k > 0, got ($n, $k)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSigNgrams.compute(input.asInstanceOf[ArrayData], n, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSigNgrams.compute($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigNgrams =
    copy(child = newChild)
}

object MinHashSigNgrams {

  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  def compute(toks: ArrayData, n: Int, k: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return null
    val (as, bs) = MinHashSig.viewCoeffs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    // token bytes decoded once per document, not once per window
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    var buf = buffers.get()
    var w = 0
    while (w + n <= m) {
      // a zero-length token still counts as a joined part (concat_ws
      // separates every NON-NULL part), so track "first part" explicitly.
      // Long arithmetic: n huge tokens can push a single window past
      // Int.MaxValue, where Int accumulation would wrap and either
      // allocate a negative-size array or skip the grow branch entirely
      var lenL = 0L
      var first = true
      var j = w
      while (j < w + n) {
        val t = tb(j)
        if (t != null) {
          lenL += (if (first) 0L else 1L) + t.length
          first = false
        }
        j += 1
      }
      if (lenL > Int.MaxValue - 16)
        throw new IllegalArgumentException(
          s"$lenL-byte shingle window exceeds the 2 GiB buffer limit; " +
            "shorten tokens or reduce n")
      val len = lenL.toInt
      if (buf.length < len) {
        buf = new Array[Byte](math.min(len.toLong * 2, (Int.MaxValue - 16).toLong).toInt)
        buffers.set(buf)
      }
      var off = 0
      first = true
      j = w
      while (j < w + n) {
        val t = tb(j)
        if (t != null) {
          if (!first) { buf(off) = ' '; off += 1 }
          System.arraycopy(t, 0, buf, off, t.length)
          off += t.length
          first = false
        }
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, MinHashSig.BaseSeed)
      var q = 0
      while (q < k) {
        val v = h * as(q) + bs(q)
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
