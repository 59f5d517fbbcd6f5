package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.streaming.EventStreams

/** The production streaming entry: a file-source stream over the same
  * parquet the batch queries read (including the TIMESTAMP(NANOS) → long →
  * timestamp conversion), windowed-aggregated, checked against the batch
  * answer on identical data.
  */
class FileStreamSpec extends SparkSpecBase {

  test("file-source stream of events matches the batch windowed aggregation") {
    // nanosAsLong session conf → ts arrives as LongType nanos
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file source wants a directory of files
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("fs_wc")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT event_type, sum(n_events) AS n FROM fs_wc GROUP BY 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.sources.Tables.events(spark, sfDir)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
