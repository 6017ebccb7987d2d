package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table: hour-windowed counts
  * and value sums per event type.
  *
  * The reference has no streaming at all (SURVEY §2.7) — this is the
  * engine extension for continuous ingestion. The aggregation is the
  * exact batch q11 twin, so the batch oracle validates the streaming
  * result: hour-aligned `window(ts, '1 hour')` starts equal
  * `date_trunc('hour', ts)`.
  *
  * Scale: stateful windowed aggregation with a watermark bounds state;
  * partial aggregation happens per-microbatch before the state-store
  * shuffle, exactly like the batch plan.
  */
object EventStream {

  /** events parquet carries TIMESTAMP(NANOS) → declare ts as LONG and
    * convert with exact integer division (see graft.Tables.events). */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Runs the streaming aggregation to completion over the static
    * parquet (memory sink, complete mode) and returns the result —
    * real Structured Streaming execution, batch-shaped answer. */
  def hourlyTotals(spark: SparkSession, dir: String,
                   sinkName: String = "st_events_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource requires a directory; the testdata table is a
    // single file → stage a symlink dir (a real deployment streams
    // from an arriving-files directory anyway).
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(srcDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(sinkName).start()
    try q.processAllAvailable() finally {
      q.stop()
      java.nio.file.Files.deleteIfExists(srcDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(srcDir)
    }
    spark.table(sinkName)
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // st01: the streaming twin of q11 — executed through a real
    // StreamingQuery (memory sink), oracle-checked like any batch op.
    "st01_stream_hourly" -> ((s, d) => hourlyTotals(s, d)))

  val oracles: Map[String, String] = Map(
    "st01_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin)
}
