package graft.functions

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro wire-format codec for the reference's second Kafka producer leg —
  * the Schema-Registry Avro value serializer of KafkaEventProducer.cs:27–36
  * over RecommendationEventSchema.cs:5–19
  * (`record RecommendationEvent { long requestedUserId;
  * array<long> recommendations; string timestamp; }`).
  *
  * The sandbox has no `spark-avro` connector module (offline resolver), but
  * the core public Apache Avro library (`avro-1.12.1.jar`) IS on Spark's
  * runtime classpath — so the codec is built directly on Avro's Generic
  * API as a pair of Catalyst expressions, mirroring the connector's
  * `to_avro`/`from_avro` contract:
  *
  *  - [[AvroEncode]]: Catalyst struct → Avro binary, optionally framed in
  *    the Confluent Schema Registry wire format (magic byte 0x00 + 4-byte
  *    big-endian schema id + body) that the C# `AvroSerializer` emits.
  *    Offline there is no registry to ask, so the schema id is a caller
  *    parameter; a live deployment would resolve it once per (topic,
  *    schema) from the registry REST API and pass it here.
  *  - [[AvroDecode]]: the inverse; with a schema id expected, a wrong
  *    magic byte or truncated frame FAILS LOUDLY (corrupt Kafka payloads
  *    must not decode to garbage rows).
  *
  * Type mapping (both directions, recursive):
  * boolean/int/long/float/double/string/bytes ↔ the matching Catalyst
  * primitive, `array<T>` ↔ `ArrayType`, nested `record` ↔ `StructType`,
  * and the 2-branch union `["null", T]` ↔ nullable T. That covers the
  * reference schema and the common Kafka payload shapes; anything else
  * (maps, fixed, enums, multi-branch unions) throws at schema-bind time,
  * not mid-stream.
  *
  * Why `CodegenFallback`: this is a serialization boundary — each row
  * makes one Avro library call whose cost dwarfs the virtual-call overhead
  * codegen would remove, and the expression sits at the edge of the plan
  * (right before a sink / right after a source), not inside analytic
  * loops. The surrounding projections still codegen.
  */
object AvroCodec {

  /** Avro schema → Catalyst type. Fails loudly on unsupported shapes. */
  def catalystType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   =>
      ArrayType(catalystType(s.getElementType),
        containsNull = isNullableUnion(s.getElementType))
    case Schema.Type.RECORD  =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), catalystType(f.schema()),
          nullable = isNullableUnion(f.schema()))
      })
    case Schema.Type.UNION   =>
      nonNullBranch(s).map(catalystType).getOrElse(
        throw new IllegalArgumentException(
          s"avro codec supports only [null, T] unions, got $s"))
    case other => throw new IllegalArgumentException(
      s"avro codec does not support Avro type $other ($s)")
  }

  private def isNullableUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(union: Schema): Option[Schema] = {
    val branches = union.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    if (branches.size == 1 && branches.size + 1 >= union.getTypes.size())
      Some(branches.head)
    else None
  }

  private def effective(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) nonNullBranch(s).getOrElse(s) else s

  /** Catalyst value (as read from an InternalRow) → Avro Generic value. */
  def toAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = effective(s)
    sch.getType match {
      case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
           Schema.Type.FLOAT | Schema.Type.DOUBLE => v
      case Schema.Type.STRING => new Utf8(v.asInstanceOf[UTF8String].getBytes)
      case Schema.Type.BYTES  =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.ARRAY  =>
        val arr = v.asInstanceOf[ArrayData]
        val et = sch.getElementType
        val cet = catalystType(et)
        val out = new java.util.ArrayList[Any](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(if (arr.isNullAt(i)) null else toAvro(arr.get(i, cet), et))
          i += 1
        }
        out
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(sch)
        val fields = sch.getFields
        var i = 0
        while (i < fields.size()) {
          val f = fields.get(i)
          val cv = if (row.isNullAt(i)) null
                   else row.get(i, catalystType(f.schema()))
          rec.put(i, toAvro(cv, f.schema()))
          i += 1
        }
        rec
      case other => throw new IllegalArgumentException(
        s"avro codec cannot encode Avro type $other")
    }
  }

  /** Avro Generic value → Catalyst value. */
  def fromAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = effective(s)
    sch.getType match {
      case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
           Schema.Type.FLOAT | Schema.Type.DOUBLE => v
      case Schema.Type.STRING =>
        UTF8String.fromString(v.toString) // Utf8 or String
      case Schema.Type.BYTES  =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.ARRAY  =>
        val in = v.asInstanceOf[java.util.List[Any]]
        val et = sch.getElementType
        new GenericArrayData(in.asScala.map(fromAvro(_, et)).toArray)
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        val fields = sch.getFields
        val out = new Array[Any](fields.size())
        var i = 0
        while (i < fields.size()) {
          out(i) = fromAvro(rec.get(i), fields.get(i).schema())
          i += 1
        }
        InternalRow.fromSeq(out.toIndexedSeq)
      case other => throw new IllegalArgumentException(
        s"avro codec cannot decode Avro type $other")
    }
  }
}

/** `struct → binary`: Avro binary encoding of `child` under `schemaJson`;
  * `schemaId >= 0` prepends the 5-byte Confluent wire frame. */
case class AvroEncode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](schema)
  // encoder reuse is per-instance; expressions are deserialized per task,
  // so no cross-thread sharing happens, but the vars stay single-purpose
  @transient private var encoder: BinaryEncoder = _

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val expect = AvroCodec.catalystType(schema)
    child.dataType match {
      case st: StructType if DataType.equalsIgnoreNullability(st, expect) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ${expect.simpleString}, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val rec = AvroCodec.toAvro(input, schema).asInstanceOf[GenericRecord]
    val bos = new ByteArrayOutputStream(64)
    if (schemaId >= 0) {
      bos.write(0) // Confluent magic byte
      bos.write((schemaId >>> 24) & 0xff); bos.write((schemaId >>> 16) & 0xff)
      bos.write((schemaId >>> 8) & 0xff); bos.write(schemaId & 0xff)
    }
    encoder = EncoderFactory.get().directBinaryEncoder(bos, encoder)
    writer.write(rec, encoder)
    encoder.flush()
    bos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** `binary → struct`: inverse of [[AvroEncode]]. With `schemaId >= 0` the
  * Confluent frame is REQUIRED and verified (magic byte + id match);
  * mismatches throw rather than decode garbage. */
case class AvroDecode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](schema)
  @transient private var decoder: BinaryDecoder = _

  override lazy val dataType: DataType = AvroCodec.catalystType(schema)
  override def prettyName: String = "avro_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val off = if (schemaId >= 0) {
      if (bytes.length < 5 || bytes(0) != 0)
        throw new IllegalArgumentException(
          s"$prettyName: payload is not Confluent-framed (len=${bytes.length})")
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
               ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      if (id != schemaId)
        throw new IllegalArgumentException(
          s"$prettyName: schema id $id != expected $schemaId")
      5
    } else 0
    decoder = DecoderFactory.get()
      .binaryDecoder(bytes, off, bytes.length - off, decoder)
    AvroCodec.fromAvro(reader.read(null, decoder), schema)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}
