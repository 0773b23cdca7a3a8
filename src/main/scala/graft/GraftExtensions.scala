package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.types.StringType
import graft.functions.{AvroDecode, AvroEncode, BoundedCollectSet, CharEntropy, HllCount, HllSketch, HllUnion, JaroWinkler, MinHashSig, MinHashSigNgrams, MisraGries, NfcNormalize, NGrams, SimHash60, VectorDot, VectorMoments, ZValue}

/** Session extension wiring for the engine's custom Catalyst surface
  * (installed with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`): registers `vector_dot` so the
  * fused-loop expression is reachable from SQL text as well as the
  * DataFrame API ([[graft.functions.dot]]), and `z_value` (Morton
  * interleave) for multi-dimensional layout clustering.
  *
  * Also registers the row-local text fingerprints `minhash_sig`,
  * `minhash_sig_ngrams`, `ngrams`, and `simhash60`, which replace
  * explode + wide-aggregate (and interpreted HOF shingling) pipelines
  * with one fused pass per document, and (r6) the aggregate
  * `bounded_collect_set(value, cap[, op_name])` — `collect_set` that
  * fails while accumulating the moment a group's distinct size passes
  * `cap`, the engine's fail-loud memory-bounded cap.
  *
  * These expressions are the library's only custom Catalyst code —
  * everything else in SURVEY §2 rides the built-in operator set by design
  * (§7.3): a custom expression enters only where the composable form
  * leaves per-row allocations, an unfoldable expression tree, or an
  * avoidable explode+shuffle in a provably hot loop.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vector_dot expects exactly 2 arguments")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValue].getName, "z_value"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "z_value expects (x, y) or (x, y, bits)")
        val bits = if (children.size == 3) children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"z_value bits must be an integer literal, got $other")
        } else 21
        ZValue(children.head, children(1), bits)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_sig expects (shingles, k)")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }
        MinHashSig(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig_ngrams"),
      new ExpressionInfo(classOf[MinHashSigNgrams].getName, "minhash_sig_ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "minhash_sig_ngrams expects (toks, n, k)")
        val Seq(n, k) = children.tail.map {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig_ngrams n and k must be integer literals, got $other")
        }
        MinHashSigNgrams(children.head, n, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngrams expects (toks, n)")
        val n = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"ngrams n must be an integer literal, got $other")
        }
        NGrams(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash60 expects exactly 1 argument")
        SimHash60(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaro_winkler expects exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize expects exactly 1 argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bounded_collect_set"),
      new ExpressionInfo(classOf[BoundedCollectSet].getName, "bounded_collect_set"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "bounded_collect_set expects (value, cap) or (value, cap, op_name)")
        val cap = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"bounded_collect_set cap must be an integer literal, got $other")
        }
        val opName = if (children.size == 3) children(2) match {
          case Literal(s, _) if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"bounded_collect_set op_name must be a string literal, got $other")
        } else "bounded_collect_set"
        // the analyzer wraps bare AggregateFunctions in an
        // AggregateExpression, same as the built-in collect_set
        BoundedCollectSet(children.head, cap, opName)
      }))
    // (r8) the Avro wire codec: schema JSON and the optional Confluent
    // schema id must be literals — the schema binds at analysis time
    def schemaIdOf(children: Seq[Expression], name: String): Int =
      if (children.size == 3) children(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name schema_id must be an integer literal, got $other")
      } else -1
    def schemaJsonOf(children: Seq[Expression], name: String): String =
      children(1) match {
        case Literal(s, StringType) if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"$name schema_json must be a string literal, got $other")
      }
    ext.injectFunction((
      FunctionIdentifier("avro_encode"),
      new ExpressionInfo(classOf[AvroEncode].getName, "avro_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "avro_encode expects (struct, schema_json[, schema_id])")
        AvroEncode(children.head, schemaJsonOf(children, "avro_encode"),
          schemaIdOf(children, "avro_encode"))
      }))
    ext.injectFunction((
      FunctionIdentifier("avro_decode"),
      new ExpressionInfo(classOf[AvroDecode].getName, "avro_decode"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "avro_decode expects (binary, schema_json[, schema_id])")
        AvroDecode(children.head, schemaJsonOf(children, "avro_decode"),
          schemaIdOf(children, "avro_decode"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllSketch].getName, "hll_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "hll_sketch expects (value[, precision])")
        val p = if (children.size == 2) children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"hll_sketch precision must be an integer literal, got $other")
        } else 12
        HllSketch(children.head, p)
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_union"),
      new ExpressionInfo(classOf[HllUnion].getName, "hll_union"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "hll_union expects exactly 1 argument")
        HllUnion(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_count"),
      new ExpressionInfo(classOf[HllCount].getName, "hll_count"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "hll_count expects exactly 1 argument")
        HllCount(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vector_moments"),
      new ExpressionInfo(classOf[VectorMoments].getName, "vector_moments"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "vector_moments expects exactly 1 argument")
        VectorMoments(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "char_entropy expects exactly 1 argument")
        CharEntropy(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "misra_gries expects (item, k)")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"misra_gries k must be an integer literal, got $other")
        }
        MisraGries(children.head, k)
      }))
  }
}
