package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so the Dataset encoder needs no outer scope. */
case class TimedEv(ts: Timestamp, event_type: String)

/** Append-mode windowed aggregation with a watermark: windows emit
  * exactly once, only after the watermark passes their end — the
  * state-bounding behavior SCALE.md relies on (complete-mode st01
  * covers the value parity; this covers the lifecycle). */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("watermarked hour windows emit once finalized, never early") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[TimedEv]
    val agg = ms.toDS()
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      ms.addData(TimedEv(t("00:10"), "click"), TimedEv(t("00:40"), "click"),
        TimedEv(t("01:10"), "view"))
      q.processAllAvailable()
      // watermark = 01:10 − 1h → no window end ≤ it → nothing emitted
      assert(spark.table("wm_test").count() == 0)

      ms.addData(TimedEv(t("03:30"), "click"))
      q.processAllAvailable()
      // watermark = 02:30 → [00,01) and [01,02) finalized
      val rows = spark.table("wm_test")
        .select(col("window.start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 01:00:00", "view", 1L)))
    } finally q.stop()
  }
}
