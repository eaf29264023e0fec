package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Dev probe: which static hash variants match the xxhash64()/hash()
  * built-ins byte-for-byte on UTF8String content. */
object HashCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val strs = Seq("abc", "hello world", "", "über Ω snow")
    val df = strs.toDF("s").select(col("s"), xxhash64(col("s")).as("xx"), hash(col("s")).as("mm"))
    df.collect().foreach { r =>
      val u = UTF8String.fromString(r.getString(0))
      val xx1 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      val mm1 = Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
      val mm2 = Murmur3_x86_32.hashUnsafeBytes2(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42)
      println(s"'${r.getString(0)}' builtin_xx=${r.getLong(1)} XXH64=$xx1 match=${r.getLong(1) == xx1} " +
        s"builtin_mm=${r.getInt(2)} mm=$mm1 m2=$mm2 mmMatch=${r.getInt(2) == mm1} mm2Match=${r.getInt(2) == mm2}")
    }
    spark.stop()
  }
}
