package graft.examples

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Runnable quickstart: the Spark-side equivalent of the reference's
  * mysql-postgres tutorial (docs/content/quickstart/) — declare a cdc-log
  * table over a file-backed change log, stream it, query the changelog.
  *
  * {{{ sbt "runMain graft.examples.CdcQuickstart" }}}
  */
object CdcQuickstart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("cdc-quickstart").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // A file-backed "database": base snapshot + append-only change log.
    val root = Files.createTempDirectory("cdc-quickstart").toString
    val dir = Paths.get(root, "inventory.products")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("meta.json"),
      """{"db":"inventory","table":"products","primaryKey":["id"],
        |"schema":"id BIGINT, name STRING, weight DOUBLE","baseOffset":0}""".stripMargin)
    Files.writeString(dir.resolve("snapshot.jsonl"),
      """{"id":1,"name":"scooter","weight":3.14}
        |{"id":2,"name":"car battery","weight":8.1}
        |{"id":3,"name":"hammer","weight":0.75}
        |""".stripMargin)
    Files.writeString(dir.resolve("log.jsonl"), "")

    // 1) Bounded read = parallel chunked snapshot (op = 'r').
    val snap = spark.read.format("cdc-log").option("path", root).load()
    println("== snapshot ==")
    snap.show(false)

    // 2) Stream it with metadata columns; mutate the log mid-stream.
    val stream = spark.readStream.format("cdc-log")
      .option("path", root)
      .option("metadata.columns", "table_name,op_ts,op_offset,row_kind")
      .load()
    val q = stream.writeStream.format("memory").queryName("changelog")
      .outputMode("append").start()
    q.processAllAvailable()

    Files.writeString(dir.resolve("log.jsonl"),
      """{"offset":1,"op":"u","tsMs":1000,"before":{"id":1,"name":"scooter","weight":3.14},"after":{"id":1,"name":"scooter XL","weight":5.18}}
        |{"offset":2,"op":"d","tsMs":2000,"before":{"id":2,"name":"car battery","weight":8.1},"after":null}
        |{"offset":3,"op":"c","tsMs":3000,"before":null,"after":{"id":4,"name":"rocks","weight":5.3}}
        |""".stripMargin)
    q.processAllAvailable()
    q.stop()

    println("== changelog (op column, update=2 rows, delete=before-image) ==")
    val log = spark.table("changelog")
    log.orderBy("op_ts", "id").show(false)

    // 3) Changelog → materialized current state (last-write-wins honoring op).
    println("== materialized state ==")
    graft.operators.ChangelogOps.materializeExact(log, Seq("id"))
      .select("id", "name", "weight").orderBy("id").show(false)
    spark.stop()
  }
}
