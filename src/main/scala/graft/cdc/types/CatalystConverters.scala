package graft.cdc.types

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, DateTimeUtils, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime JVM-value → Catalyst-value converter battery.
  *
  * The Spark counterpart of the reference's deserialization converters
  * (RowDataDebeziumDeserializeSchema.java:264-623: ~30 converters covering
  * temporals in several physical encodings, precise/lossy decimals, binary
  * shapes, nested rows; MySqlDeserializationConverterFactory.java:83-151 for
  * SET→ARRAY<STRING> and geometry→GeoJSON;
  * MongoDBConnectorDeserializationSchema.java:216-758 for ARRAY/MAP). Every
  * type `TypeMapping` can emit has a converter here, with the same
  * physical-encoding tolerance the reference shows (e.g. BOOLEAN from
  * Boolean/Byte/Short, DATE from epoch-day int or java.time/java.sql dates,
  * TIMESTAMP from micros, java.sql.Timestamp, or Instant).
  */
object CatalystConverters {

  def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null

    // strings: geometry/JSON/ENUM all arrive as strings (reference :514-524)
    case (s: String, StringType)       => UTF8String.fromString(s)
    case (u: UTF8String, StringType)   => u
    case (other, StringType)           => UTF8String.fromString(other.toString)

    // booleans accept Boolean/Byte/Short (reference :335-353)
    case (b: Boolean, BooleanType) => b
    case (b: Byte, BooleanType)    => b != 0
    case (s: Short, BooleanType)   => s != 0
    case (i: Int, BooleanType)     => i != 0

    case (b: Byte, ByteType)   => b
    case (i: Int, ByteType)    => i.toByte
    case (l: Long, ByteType)   => l.toByte
    case (s: Short, ShortType) => s
    case (b: Byte, ShortType)  => b.toShort
    case (i: Int, ShortType)   => i.toShort
    case (l: Long, ShortType)  => l.toShort

    case (i: Int, IntegerType)   => i
    case (s: Short, IntegerType) => s.toInt
    case (b: Byte, IntegerType)  => b.toInt
    case (l: Long, IntegerType)  => l.toInt
    case (l: Long, LongType)     => l
    case (i: Int, LongType)      => i.toLong

    case (f: Float, FloatType)   => f
    case (d: Double, FloatType)  => d.toFloat
    case (d: Double, DoubleType) => d
    case (f: Float, DoubleType)  => f.toDouble

    // decimals from precise bytes-as-BigDecimal, string, double, or integral
    // (reference :548-580 incl. VariableScaleDecimal and string decimals)
    case (d: java.math.BigDecimal, dec: DecimalType) => Decimal(d, dec.precision, dec.scale)
    case (d: BigDecimal, dec: DecimalType)           => Decimal(d.bigDecimal, dec.precision, dec.scale)
    case (s: String, dec: DecimalType) =>
      Decimal(new java.math.BigDecimal(s), dec.precision, dec.scale)
    case (d: Double, dec: DecimalType) =>
      Decimal(java.math.BigDecimal.valueOf(d), dec.precision, dec.scale)
    case (l: Long, dec: DecimalType) =>
      Decimal(java.math.BigDecimal.valueOf(l), dec.precision, dec.scale)
    case (i: Int, dec: DecimalType) =>
      Decimal(java.math.BigDecimal.valueOf(i.toLong), dec.precision, dec.scale)
    case (b: java.math.BigInteger, dec: DecimalType) =>
      Decimal(new java.math.BigDecimal(b), dec.precision, dec.scale)

    // DATE = epoch days (reference :427-437)
    case (i: Int, DateType)                => i
    case (d: java.sql.Date, DateType)      => DateTimeUtils.fromJavaDate(d)
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt

    // TIMESTAMP (LTZ) = micros since epoch (reference :490-512)
    case (l: Long, TimestampType)               => l // already micros
    case (t: java.sql.Timestamp, TimestampType) => DateTimeUtils.fromJavaTimestamp(t)
    case (i: java.time.Instant, TimestampType)  => DateTimeUtils.instantToMicros(i)

    // TIMESTAMP_NTZ = micros in the local (unshifted) frame (reference
    // Timestamp/MicroTimestamp/NanoTimestamp converters :462-488)
    case (l: Long, TimestampNTZType)                   => l // already micros
    case (dt0: java.time.LocalDateTime, TimestampNTZType) =>
      DateTimeUtils.localDateTimeToMicros(dt0)

    // BINARY from byte[] or ByteBuffer (reference :526-546)
    case (b: Array[Byte], BinaryType)        => b
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out

    // ARRAY: Seq/Array of element values; a comma-joined string feeds the
    // MySQL SET → ARRAY<STRING> path (MySqlDeserializationConverterFactory
    // .java:129-138)
    case (s: Seq[_], ArrayType(et, _)) =>
      new GenericArrayData(s.map(toCatalyst(_, et)).toArray)
    case (a: Array[_], ArrayType(et, _)) =>
      new GenericArrayData(a.map(toCatalyst(_, et)))
    case (s: String, ArrayType(StringType, _)) =>
      new GenericArrayData(s.split(",").map(x => UTF8String.fromString(x): Any))

    // MAP (MongoDB module supports MAP, MongoDBConnectorDeserializationSchema
    // .java:259-262)
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      ArrayBasedMapData(m.toSeq.map { case (k, v) => toCatalyst(k, kt) -> toCatalyst(v, vt) }.toMap)
    case (m: java.util.Map[_, _], mt: MapType) =>
      import scala.jdk.CollectionConverters._
      toCatalyst(m.asScala.toMap, mt)

    // nested ROW from a positional field array or a Row (reference :582-623)
    case (fields: Array[Any], st: StructType) =>
      require(fields.length == st.length, s"struct arity ${fields.length} != ${st.length}")
      new GenericInternalRow(fields.zip(st.fields).map { case (f, sf) => toCatalyst(f, sf.dataType) })
    case (r: org.apache.spark.sql.Row, st: StructType) =>
      new GenericInternalRow(st.fields.indices.map(i => toCatalyst(r.get(i), st(i).dataType)).toArray)
    case (r: InternalRow, _: StructType) => r

    case (other, t) => throw new IllegalArgumentException(
      s"unsupported value ${other.getClass.getName} ($other) for Catalyst type $t")
  }
}
