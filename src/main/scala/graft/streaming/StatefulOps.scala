package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (extension; SURVEY §2.12 — the reference has
  * no stateful streaming surface at all): per-key running state via
  * `mapGroupsWithState`, the Spark-native escape hatch when windowed
  * aggregation can't express the state machine.
  *
  * State stays keyed and bounded (one small struct per user); at cluster
  * scale the state store shards with the shuffle partitioning.
  */
object StatefulOps {

  case class EventIn(user_id: Long, event_type: String, value: Double)
  case class UserStats(
      user_id: Long, n_events: Long, n_purchases: Long, total_value: Double)

  /** Running per-user statistics over an event stream. */
  def userStats(
      spark: SparkSession, events: Dataset[EventIn]): Dataset[UserStats] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[EventIn], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L, 0.0))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(uid,
              acc.n_events + 1,
              acc.n_purchases + (if (e.event_type == "purchase") 1 else 0),
              acc.total_value + e.value)
          }
          state.update(next)
          next
      }
  }

  /** Drive userStats over a streaming source to completion (update mode). */
  def runUserStats(
      spark: SparkSession, events: Dataset[EventIn],
      name: String): Dataset[UserStats] = {
    import spark.implicits._
    val q = userStats(spark, events).writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).as[UserStats]
  }

  case class SessionEv(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class SessionRow(user_id: Long, start_us: Long, end_us: Long, n: Long)

  /** Streaming sessionization via `flatMapGroupsWithState` + event-time
    * timeout — the custom-state form of `session_window` for when the
    * per-session emission needs a real state machine (emit-on-close,
    * custom gap logic). Semantics match session_window / the
    * gaps-and-islands oracle: a new session starts when the gap is
    * ≥ `gapMinutes`; a session's end is last event + gap (exclusive).
    *
    * Emission is honest streaming: a session is emitted when an event
    * CLOSES it (the next event opens a later session) or when the
    * event-time watermark passes its timeout (`GroupState
    * .setTimeoutTimestamp(last + gap)`); a session still open at the
    * end of input is never emitted. State per key is one 3-long struct,
    * expired by the watermark — bounded regardless of stream length,
    * sharded with the shuffle partitioning at cluster scale. */
  def sessionize(
      spark: SparkSession, events: Dataset[SessionEv],
      gapMinutes: Int): Dataset[SessionRow] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def us(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEv],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val open = state.get
            state.remove()
            Iterator.single(SessionRow(
              uid, open.startUs, open.lastUs + gapUs, open.n))
          } else {
            val ts = batch.map(e => us(e.ts)).toArray.sorted
            val closed = List.newBuilder[SessionRow]
            var open = state.getOption.orNull
            ts.foreach { t =>
              if (open == null) open = OpenSession(t, t, 1L)
              else if (t - open.lastUs >= gapUs) {
                closed += SessionRow(
                  uid, open.startUs, open.lastUs + gapUs, open.n)
                open = OpenSession(t, t, 1L)
              } else open = OpenSession(open.startUs, t, open.n + 1)
            }
            if (open != null) {
              state.update(open)
              state.setTimeoutTimestamp((open.lastUs + gapUs) / 1000)
            }
            closed.result().iterator
          }
      }
  }
}
