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
  // q39: how many mined 3-step paths the report keeps
  private[graft] val TopPaths = 20

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

  final case class TypedEv(user_id: Long, event_type: String,
      event_id: Long, ts_us: Long)
  final case class LastSeen(ts_us: Long)
  final case class Kept(event_id: Long, user_id: Long, event_type: String,
      ts_us: Long)

  /** Stateful streaming debounce — q33's lag semantics on a live
    * stream: the state store keeps ONE timestamp per (user, type) key
    * (the last event seen, kept or dropped — q33 compares against the
    * previous event, not the previous survivor), each micro-batch's
    * group is processed in event-time order, and survivors emit in
    * Append mode. State is O(active keys) with an 8-byte payload —
    * the cheapest stateful operator in the engine; a production
    * deployment adds a timeout to retire idle keys. */
  def debounceStream(ds: Dataset[TypedEv], gapUs: Long): Dataset[Kept] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LastSeen, Kept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), evs: Iterator[TypedEv],
            state: GroupState[LastSeen]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[Kept]
          var prev = state.getOption.map(_.ts_us)
          sorted.foreach { e =>
            if (prev.forall(p => e.ts_us - p >= gapUs))
              out += Kept(e.event_id, key._1, key._2, e.ts_us)
            prev = Some(e.ts_us)
          }
          prev.foreach(p => state.update(LastSeen(p)))
          out.iterator
      }
  }

  final case class OpenPath(types: List[String], last_us: Long)
  final case class PathTriple(user_id: Long, step1: String,
      step2: String, step3: String)

  /** Stateful streaming PATH MINING — q39's triple extraction on a
    * live stream: the state store keeps each user's OPEN session as
    * its event-type list (newest-first — see the prepend note
    * below); when the inactivity gap closes a
    * session, its 3-step paths emit in Append mode (a session shorter
    * than 3 emits nothing). Each user's final session stays open on a
    * finite source — st05's discipline — so the oracle is q39's
    * triple table MINUS every user's last session, pinning both the
    * path math and the open-state semantics. State is one short
    * string list per user, bounded by the open session's length. */
  def pathStream(ds: Dataset[TypedEv]): Dataset[PathTriple] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenPath, PathTriple](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TypedEv],
            state: GroupState[OpenPath]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[PathTriple]
          // the open session is stored NEWEST-FIRST so each event is
          // an O(1) prepend (an append would copy the whole list per
          // event — quadratic in session length); close() restores
          // event order with one reverse
          var types = state.getOption.map(_.types).getOrElse(Nil)
          var last = state.getOption.map(_.last_us)
          def close(): Unit =
            types.reverse.sliding(3).filter(_.length == 3).foreach { t =>
              out += PathTriple(uid, t.head, t(1), t(2))
            }
          sorted.foreach { e =>
            if (last.exists(l => e.ts_us - l > GapUs)) {
              close()
              types = Nil
            }
            types = e.event_type :: types
            last = Some(e.ts_us)
          }
          last.foreach(l => state.update(OpenPath(types, l)))
          out.iterator
      }
  }

  final case class LastChannel(channel: String)
  final case class Attributed(event_id: Long, user_id: Long,
      channel: String, ts_us: Long)

  /** Stateful streaming LAST-TOUCH ATTRIBUTION — q37's credit rule on
    * a live stream: the state store keeps ONE string per user (the
    * most recent non-purchase event type seen); each micro-batch's
    * group is processed in event-time order, and every purchase emits
    * an attribution row crediting the stored channel ('direct' when
    * the user has no preceding touch). Append mode; state is one
    * small string per active user — the same O(active keys) footprint
    * as debounce, and the batch window (q37) and this state rule
    * answer to ONE oracle, the st13/q33 twin discipline. */
  def lastTouchStream(ds: Dataset[TypedEv]): Dataset[Attributed] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastChannel, Attributed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TypedEv],
            state: GroupState[LastChannel]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[Attributed]
          var chan = state.getOption.map(_.channel)
          sorted.foreach { e =>
            if (e.event_type == "purchase")
              out += Attributed(e.event_id, uid,
                chan.getOrElse("direct"), e.ts_us)
            else chan = Some(e.event_type)
          }
          chan.foreach(c => state.update(LastChannel(c)))
          out.iterator
      }
  }

  final case class HourEv(user_id: Long, hour_us: Long, event_id: Long,
      ts_us: Long)
  final case class HourQuota(n: Long)
  final case class KeptHour(event_id: Long, user_id: Long, hour_us: Long,
      ts_us: Long)

  /** Stateful streaming RATE LIMIT — q36's quota rule on a live
    * stream: the state store keeps one counter per open (user, hour)
    * key; each micro-batch's group is processed in event-time order
    * and only the first `n` events of the hour survive (Append mode).
    * State is an 8-byte counter per active key — hour keys retire
    * naturally as event time advances (a production deployment adds
    * an event-time timeout to reap them; a finite replay just leaves
    * the last hour open, which changes nothing emitted). */
  def rateLimitStream(ds: Dataset[HourEv], n: Int): Dataset[KeptHour] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(e => (e.user_id, e.hour_us))
      .flatMapGroupsWithState[HourQuota, KeptHour](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), evs: Iterator[HourEv],
            state: GroupState[HourQuota]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var used = state.getOption.map(_.n).getOrElse(0L)
          val out = scala.collection.mutable.ListBuffer.empty[KeptHour]
          sorted.foreach { e =>
            if (used < n)
              out += KeptHour(e.event_id, key._1, key._2, e.ts_us)
            used += 1
          }
          state.update(HourQuota(used))
          out.iterator
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_sessionize" -> ((s, d) =>
      relational(events(s, d))
        .orderBy("user_id", "session_start_us")),

    // q46: ASSOCIATION RULES (market-basket mining, the Apriori
    // level-2 table): baskets are q13's sessions, items the distinct
    // event types inside each; every item pair gets support,
    // confidence and lift — the "users who did A also did B" readout
    // behind recommendation and merchandising dashboards, and the
    // discovery complement to q29's fixed funnel / q35's ordered
    // transitions (association is ORDER-FREE co-occurrence). All
    // three metrics ship as exact integers: counts are longs and
    // conf/lift are integer floor-divisions in micro-units —
    // n_ab·10⁶ div n_a and n_ab·N·10⁶ div (n_a·n_b) — so the gate
    // needs no float anywhere. (At 100 TB the 10⁶ scaling bounds the
    // dividend by n_ab·N·10⁶ — re-scale or go DECIMAL past ~10⁹
    // baskets.)
    //
    // Scale: one user-keyed exchange builds sessions (q13's); the
    // basket table is (user, sess, type) triples, deduped; the pair
    // join is keyed on the basket id so pair work is Σ items²/basket
    // (bounded by the type vocabulary); supports and the total are
    // |types|- and 1-row broadcasts. The output is ≤|types|²/2 rows
    // — corpus-independent.
    "q46_association_rules" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val baskets = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag("ts_us", 1).over(w) > GapUs, 1)
            .when(lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sess_no",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select("user_id", "sess_no", "event_type").distinct()
        .localCheckpoint() // feeds supports, the pair join, the total
      val tot = baskets.select("user_id", "sess_no").distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val itemN = baskets.groupBy("event_type")
        .agg(count(lit(1)).as("n_item"))
      val pairs = baskets.join(
          baskets.select(col("user_id"), col("sess_no"),
            col("event_type").as("item_b")),
          Seq("user_id", "sess_no"))
        .filter(col("event_type") < col("item_b"))
        .groupBy(col("event_type").as("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(itemN.select(col("event_type").as("item_a"),
          col("n_item").as("n_a"))), Seq("item_a"))
        .join(broadcast(itemN.select(col("event_type").as("item_b"),
          col("n_item").as("n_b"))), Seq("item_b"))
        .crossJoin(broadcast(tot))
        .withColumn("conf_u6", expr("n_ab * 1000000 div n_a"))
        .withColumn("lift_u6",
          expr("n_ab * n_baskets * 1000000 div (n_a * n_b)"))
        .select("item_a", "item_b", "n_ab", "n_a", "n_b", "n_baskets",
          "conf_u6", "lift_u6")
        .orderBy("item_a", "item_b")
    }),

    // q29: FUNNEL conversion over the sessionized stream — per
    // session, did view → click → purchase happen in first-occurrence
    // order? (t_view ≤ t_click ≤ t_purchase on each type's FIRST
    // timestamp — the standard product-analytics funnel; a click
    // preceding the session's first view deliberately does not count.)
    // Same single user_id shuffle as q13, then per-session conditional
    // mins and one global integer aggregate — counts and exact int/int
    // conversion ratios, so the whole report is hash-exact. At scale
    // nothing beyond q13's session window runs over raw events; the
    // funnel itself aggregates |sessions| rows to one.
    // q39: TOP PATHS (sequential pattern mining) — where q29 checks
    // ONE fixed funnel, this MINES the flows: every run of three
    // consecutive events inside a session (two leads over the session
    // ordering) becomes a (step1, step2, step3) path, counted
    // corpus-wide, top-20 reported. The product-analytics "what do
    // users actually do" table, and the discovery step that tells you
    // WHICH funnels (q29) are worth instrumenting. Same single
    // user-keyed exchange as q13; the rank window runs over the
    // ≤|types|³-row aggregate (125 here), the documented
    // bounded-post-aggregate window pattern — never over events.
    "q39_top_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val sess = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag("ts_us", 1).over(w) > GapUs, 1)
            .when(lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sess_no",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val ws = Window.partitionBy("user_id", "sess_no")
        .orderBy("ts_us", "event_id")
      val paths = sess
        .withColumn("t1", lead("event_type", 1).over(ws))
        .withColumn("t2", lead("event_type", 2).over(ws))
        .filter(col("t1").isNotNull && col("t2").isNotNull)
        .groupBy(col("event_type").as("step1"), col("t1").as("step2"),
          col("t2").as("step3"))
        .agg(count(lit(1)).as("n"))
      val wr = Window.orderBy(col("n").desc, col("step1"), col("step2"),
        col("step3"))
      paths.withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= TopPaths)
        .select(col("rank").cast("long").as("rank"), col("step1"),
          col("step2"), col("step3"), col("n"))
        .orderBy("rank")
    }),

    "q29_funnel_conversion" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val perSession = events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag("ts_us", 1).over(w) > GapUs, 1)
            .when(lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sess_no",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_no")
        .agg(
          min(when(col("event_type") === "view", col("ts_us"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts_us"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts_us")))
            .as("t_purchase"))
      val step1 = col("t_view").isNotNull
      val step2 = step1 && col("t_click").isNotNull &&
        col("t_view") <= col("t_click")
      val step3 = step2 && col("t_purchase").isNotNull &&
        col("t_click") <= col("t_purchase")
      perSession.agg(
          count(lit(1)).as("n_sessions"),
          sum(when(step1, 1L).otherwise(0L)).as("n_view"),
          sum(when(step2, 1L).otherwise(0L)).as("n_view_click"),
          sum(when(step3, 1L).otherwise(0L)).as("n_full_funnel"))
        .select(col("n_sessions"), col("n_view"), col("n_view_click"),
          col("n_full_funnel"),
          when(col("n_view") === 0, lit(null)).otherwise(
            col("n_view_click").cast("double") / col("n_view"))
            .as("view_to_click"),
          when(col("n_view_click") === 0, lit(null)).otherwise(
            col("n_full_funnel").cast("double") / col("n_view_click"))
            .as("click_to_purchase"))
    }))

  /** q39/st16 shared oracle: the session → triple → rank SQL chain.
    * `closedOnly` restricts to sessions BEFORE each user's last —
    * st16's open-state law — so the batch and streaming twins derive
    * from ONE builder and cannot drift. */
  private[graft] def pathOracleSql(closedOnly: Boolean): String = {
    val closedCtes = if (closedOnly)
      """, last_sess AS (
        |  SELECT user_id, max(sess_no) AS mx
        |  FROM numbered GROUP BY user_id
        |), closed AS (
        |  SELECT n.user_id, n.event_id, n.event_type, n.ts_us, n.sess_no
        |  FROM numbered n JOIN last_sess l
        |    ON n.user_id = l.user_id AND n.sess_no < l.mx
        |)""".stripMargin
    else ""
    val src = if (closedOnly) "closed" else "numbered"
    s"""WITH base AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, event_id, event_type, ts_us,
       |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
       |         WHEN ts_us - lag(ts_us) OVER w > $GapUs THEN 1
       |         ELSE 0 END AS new_sess
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
       |), numbered AS (
       |  SELECT user_id, event_id, event_type, ts_us,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
       |  FROM flagged
       |)""".stripMargin + closedCtes + s"""
       |, triples AS (
       |  SELECT event_type AS step1,
       |    lead(event_type, 1) OVER ws AS step2,
       |    lead(event_type, 2) OVER ws AS step3
       |  FROM $src
       |  WINDOW ws AS (PARTITION BY user_id, sess_no
       |    ORDER BY ts_us, event_id)
       |), counts AS (
       |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
       |  FROM triples
       |  WHERE step2 IS NOT NULL AND step3 IS NOT NULL
       |  GROUP BY step1, step2, step3
       |)
       |SELECT CAST(rank AS BIGINT) AS rank, step1, step2, step3, n
       |FROM (
       |  SELECT step1, step2, step3, n,
       |    row_number() OVER (
       |      ORDER BY n DESC, step1, step2, step3) AS rank
       |  FROM counts)
       |WHERE rank <= $TopPaths
       |ORDER BY rank""".stripMargin
  }

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
         |ORDER BY user_id, session_start_us""".stripMargin,

    // q13's session numbering, two leads inside the session, counts,
    // rank over the bounded path table (shared builder with st16)
    "q39_top_paths" -> pathOracleSql(closedOnly = false),

    // q46: q13's session numbering → distinct (basket, item) triples
    // → self-join pairs + integer micro-unit floor divisions.
    "q46_association_rules" ->
      s"""WITH base AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
         |  FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, event_type, ts_us,
         |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
         |         WHEN ts_us - lag(ts_us) OVER w > $GapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |), numbered AS (
         |  SELECT user_id, event_type,
         |    sum(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
         |  FROM flagged
         |), baskets AS (
         |  SELECT DISTINCT user_id, sess_no, event_type FROM numbered
         |), tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM (
         |    SELECT DISTINCT user_id, sess_no FROM baskets)
         |), item AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
         |  FROM baskets GROUP BY 1
         |), p AS (
         |  SELECT a.event_type AS item_a, b.event_type AS item_b,
         |    CAST(count(*) AS BIGINT) AS n_ab
         |  FROM baskets a JOIN baskets b
         |    ON a.user_id = b.user_id AND a.sess_no = b.sess_no
         |    AND a.event_type < b.event_type
         |  GROUP BY 1, 2
         |)
         |SELECT item_a, item_b, n_ab,
         |  ia.n_item AS n_a, ib.n_item AS n_b, tot.n_baskets,
         |  (n_ab * 1000000) // ia.n_item AS conf_u6,
         |  (n_ab * tot.n_baskets * 1000000)
         |    // (ia.n_item * ib.n_item) AS lift_u6
         |FROM p
         |JOIN item ia ON ia.event_type = p.item_a
         |JOIN item ib ON ib.event_type = p.item_b
         |CROSS JOIN tot
         |ORDER BY item_a, item_b""".stripMargin,

    "q29_funnel_conversion" ->
      s"""WITH base AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
         |  FROM events
         |), flagged AS (
         |  SELECT user_id, event_id, event_type, ts_us,
         |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
         |         WHEN ts_us - lag(ts_us) OVER w > $GapUs THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |), numbered AS (
         |  SELECT user_id, event_type, ts_us,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
         |  FROM flagged
         |), per_session AS (
         |  SELECT user_id, sess_no,
         |    min(CASE WHEN event_type = 'view' THEN ts_us END) AS t_view,
         |    min(CASE WHEN event_type = 'click' THEN ts_us END) AS t_click,
         |    min(CASE WHEN event_type = 'purchase' THEN ts_us END)
         |      AS t_purchase
         |  FROM numbered GROUP BY user_id, sess_no
         |), counts AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         |    CAST(count(CASE WHEN t_view IS NOT NULL THEN 1 END)
         |      AS BIGINT) AS n_view,
         |    CAST(count(CASE WHEN t_view IS NOT NULL
         |      AND t_click IS NOT NULL AND t_view <= t_click THEN 1 END)
         |      AS BIGINT) AS n_view_click,
         |    CAST(count(CASE WHEN t_view IS NOT NULL
         |      AND t_click IS NOT NULL AND t_view <= t_click
         |      AND t_purchase IS NOT NULL AND t_click <= t_purchase
         |      THEN 1 END) AS BIGINT) AS n_full_funnel
         |  FROM per_session)
         |SELECT n_sessions, n_view, n_view_click, n_full_funnel,
         |  CASE WHEN n_view = 0 THEN NULL
         |       ELSE CAST(n_view_click AS DOUBLE) / n_view
         |  END AS view_to_click,
         |  CASE WHEN n_view_click = 0 THEN NULL
         |       ELSE CAST(n_full_funnel AS DOUBLE) / n_view_click
         |  END AS click_to_purchase
         |FROM counts""".stripMargin)
}
