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
}
