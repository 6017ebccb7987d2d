package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization (30-minute inactivity gap) — a core
  * training-data/behavioral-pipeline operator the reference lacks.
  *
  * Two implementations with identical semantics:
  *   - relational (q13): lag/window over (user, ts) — one shuffle on
  *     user_id, scales as a normal window;
  *   - stateful streaming: `flatMapGroupsWithState` keeping one open
  *     session per user, emitting sessions as the gap closes them —
  *     the Structured Streaming state-store path for continuous
  *     ingestion.
  *
  * Timestamps flow as epoch MICROSECONDS (bigint) so the DuckDB
  * oracle (`epoch_us`) compares exactly.
  */
object Sessionize {

  val GapUs: Long = 1800L * 1000000L // 30 min

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)
  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Relational sessionization of an events DF (needs user_id,
    * event_id, ts columns). */
  def relational(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_sess",
        when(col("ts_us") - lag("ts_us", 1).over(w) > GapUs, 1)
          .when(lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_no",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_no")
      .agg(min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "session_end_us", "n_events")
  }

  /** Stateful streaming sessionization: one OpenSession per user in
    * the state store; closed sessions are emitted in Append mode.
    * Events inside a micro-batch are sorted per group (event-time
    * order within the batch). The final open session stays in state
    * until a later batch (or a timeout policy) closes it. */
  def sessionizeStream(ds: Dataset[Ev]): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case None =>
                open = Some(OpenSession(e.ts_us, e.ts_us, 1))
              case Some(o) if e.ts_us - o.end_us > GapUs =>
                out += Session(uid, o.start_us, o.end_us, o.n)
                open = Some(OpenSession(e.ts_us, e.ts_us, 1))
              case Some(o) =>
                open = Some(OpenSession(o.start_us,
                  math.max(o.end_us, e.ts_us), o.n + 1))
            }
          }
          open.foreach(state.update)
          out.iterator
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_sessionize" -> ((s, d) =>
      relational(events(s, d))
        .orderBy("user_id", "session_start_us")))

  val oracles: Map[String, String] = Map(
    "q13_sessionize" ->
      s"""WITH base AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, ts_us,
         |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
         |         WHEN ts_us - lag(ts_us) OVER w > $GapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |), numbered AS (
         |  SELECT user_id, ts_us,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
         |  FROM flagged
         |)
         |SELECT user_id, min(ts_us) AS session_start_us,
         |  max(ts_us) AS session_end_us, count(*) AS n_events
         |FROM numbered
         |GROUP BY user_id, sess_no
         |ORDER BY user_id, session_start_us""".stripMargin)
}
