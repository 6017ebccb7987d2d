package graft

import graft.operators.Sessionize
import graft.operators.Sessionize.{Ev, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming sessionizer must agree with the relational
  * window formulation: feed the same events in two micro-batches and
  * compare the emitted (closed) sessions against the batch result
  * minus each user's final (still-open) session. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val M = 60L * 1000000L // one minute in µs
  // user 1: two sessions (gap 40min); user 2: one session; the second
  // batch closes user 1's second session with a >30min-later event
  private val batch1 = Seq(
    Ev(1, 10, 0 * M), Ev(1, 11, 10 * M), Ev(1, 12, 50 * M),
    Ev(2, 20, 5 * M))
  private val batch2 = Seq(
    Ev(1, 13, 55 * M), Ev(1, 14, 120 * M), // closes session [50,55]
    Ev(2, 21, 15 * M))

  test("streaming sessions equal relational sessions (open ones pending)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Sessionize.sessionizeStream(ms.toDS())
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_test").as[Session].collect().toSet

    // relational truth over the union
    val all = (batch1 ++ batch2).toDF()
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.timestamp_micros($"ts_us").as("ts"))
    val rel = Sessionize.relational(all).as[Session].collect()
    val lastPerUser = rel.groupBy(_.user_id).view
      .mapValues(_.maxBy(_.session_start_us)).values.toSet
    val expectedClosed = rel.toSet -- lastPerUser

    assert(streamed == expectedClosed)
    // sanity: user 1's first session is [0,10] with 2 events
    assert(streamed.contains(Session(1, 0, 10 * M, 2)))
    assert(streamed.contains(Session(1, 50 * M, 55 * M, 2)))
  }
}
