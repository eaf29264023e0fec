package graft.cdc.types

import org.apache.spark.sql.types._

/** Database-type → Spark type mapping battery.
  *
  * Re-derivation of the reference's catalog type mapping
  * (mysql/schema/MySqlTypeUtils.java:84-133 for MySQL;
  * oceanbase/source/OceanBaseJdbcConverter.java:60-190 is the equivalent
  * JDBC battery) targeting Spark's type system: unsigned widening,
  * TINYINT(1)→BOOLEAN, BIGINT UNSIGNED→DECIMAL(20,0), DATETIME→
  * TIMESTAMP_NTZ vs TIMESTAMP(LTZ), SET→ARRAY<STRING>, geometry→GeoJSON
  * string (MySqlDeserializationConverterFactory.java:83-110,129-138).
  */
object TypeMapping {

  /** Map a MySQL column type to a Spark DataType.
    * @param typeName  uppercase base type name (e.g. "INT", "VARCHAR")
    * @param precision display width / precision (0 = unspecified)
    * @param scale     decimal scale
    * @param unsigned  UNSIGNED modifier present
    */
  def mysqlToSpark(typeName: String, precision: Int = 0, scale: Int = 0,
      unsigned: Boolean = false): DataType = typeName.toUpperCase match {
    // TINYINT(1) is MySQL's boolean (MySqlTypeUtils.java:88)
    case "TINYINT" if precision == 1 => BooleanType
    case "BOOLEAN" | "BOOL"          => BooleanType
    // unsigned widening (:89-101): each unsigned type needs the next wider
    case "TINYINT"                   => if (unsigned) ShortType else ByteType
    case "SMALLINT"                  => if (unsigned) IntegerType else ShortType
    case "MEDIUMINT"                 => IntegerType
    case "INT" | "INTEGER"           => if (unsigned) LongType else IntegerType
    case "BIGINT"                    => if (unsigned) DecimalType(20, 0) else LongType
    case "DECIMAL" | "NUMERIC"       =>
      DecimalType(if (precision > 0) precision else 10, scale)
    case "FLOAT"                     => FloatType
    case "DOUBLE" | "REAL"           => DoubleType
    case "DATE"                      => DateType
    // DATETIME has no zone → NTZ; TIMESTAMP is zone-shifted by the server
    // (RowDataDebeziumDeserializeSchema.java:462-512)
    case "DATETIME"                  => TimestampNTZType
    case "TIMESTAMP"                 => TimestampType
    // TIME → millis-of-day int (RowDataDebeziumDeserializeSchema.java:439-460)
    case "TIME"                      => IntegerType
    case "YEAR"                      => IntegerType
    case "CHAR" | "VARCHAR" | "TINYTEXT" | "TEXT" | "MEDIUMTEXT" | "LONGTEXT" =>
      StringType
    case "BINARY" | "VARBINARY" | "TINYBLOB" | "BLOB" | "MEDIUMBLOB" | "LONGBLOB" =>
      BinaryType
    case "BIT"                       => if (precision == 1) BooleanType else BinaryType
    case "ENUM"                      => StringType
    // SET → ARRAY<STRING> split on comma (MySqlDeserializationConverterFactory.java:129-138)
    case "SET"                       => ArrayType(StringType)
    case "JSON"                      => StringType
    // geometry family serialized as GeoJSON strings (:83-110)
    case "GEOMETRY" | "POINT" | "LINESTRING" | "POLYGON" | "MULTIPOINT" |
         "MULTILINESTRING" | "MULTIPOLYGON" | "GEOMETRYCOLLECTION" => StringType
    case other =>
      throw new IllegalArgumentException(s"unsupported MySQL type $other")
  }

  /** Parse a DDL-ish column spec like "INT UNSIGNED", "DECIMAL(10,2)",
    * "TINYINT(1)", "VARCHAR(255)" into a Spark type. */
  def parseMysqlColumn(spec: String): DataType = {
    val s = spec.trim.toUpperCase
    val unsigned = s.contains("UNSIGNED")
    val base = s.replace("UNSIGNED", "").trim
    val m = "([A-Z]+)\\s*(?:\\((\\d+)(?:\\s*,\\s*(\\d+))?\\))?".r
    base match {
      case m(name, p, sc) =>
        mysqlToSpark(name,
          Option(p).map(_.toInt).getOrElse(0),
          Option(sc).map(_.toInt).getOrElse(0), unsigned)
      case _ => throw new IllegalArgumentException(s"cannot parse column spec '$spec'")
    }
  }
}
