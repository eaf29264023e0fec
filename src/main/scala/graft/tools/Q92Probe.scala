package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for q92: drains the cdc-fed dimension stream alone (event
  * mix, offset range), then runs the full gate query. Caught two fixture
  * contract facts worth keeping executable: log reads are resume-AFTER
  * (an event at offset 0 = baseOffset is unreadable from `earliest`), and
  * a version at event-time 0 = the initial watermark is dropped as late. */
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger

    val root = graft.queries.CdcQueries.writeTemporalProviderTable(spark, sfDir)
    println(s"fixture root: $root")
    val dimRaw = spark.readStream.format("cdc-log").option("path", root)
      .option("scan.startup.mode", "earliest")
      .option("metadata.columns", "op_offset,row_kind")
      .option("scan.log.max-offsets-per-batch", "300000")
      .load()
    val q = dimRaw.writeStream.outputMode("append").format("memory").queryName("q92dbg")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val df = spark.table("q92dbg")
    println(s"dim rows: ${df.count()}")
    df.groupBy("op", "row_kind").count().orderBy("op", "row_kind").show(20, false)
    df.select(min(col("op_offset")), max(col("op_offset"))).show(false)

    val out = graft.queries.CdcQueries.queries("q92_cdc_temporal_enrich")(spark, sfDir)
    println(s"q92 rows: ${out.count()}")
    spark.stop()
  }
}
