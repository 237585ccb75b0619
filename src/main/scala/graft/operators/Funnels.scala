package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics — the funnel / cohort workload the
  * reference warehouse serves from its events tables (the windowed
  * self-join shapes in SURVEY §2.5; no dedicated executor node — PG
  * spells these with window functions and lateral joins, e.g. the
  * patterns around nodeWindowAgg.c).
  *
  * Scale: every stage is a per-user aggregate (map-side partials over
  * the user hash shuffle) or a user equi-join — each successive funnel
  * stage's left side is one row per qualifying user, monotonically
  * shrinking, so stage joins get cheaper as the funnel narrows. No
  * window over the full event stream, no event×event self-join. */
object Funnels {

  /** Ordered-step funnel with an overall conversion window anchored at
    * the first step (the product-analytics default): step k counts
    * users whose earliest step-k event follows their step-(k−1) time
    * and lands within `windowHours` of their step-1 time. Returns one
    * row per step: (step, event_type, users). */
  def funnel(
      events: DataFrame, steps: Seq[String],
      windowHours: Int, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty)
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    // stage 1: earliest first-step event per user
    var reached = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("t")).as("t1"))
      .withColumn("tk", col("t1"))
    val limit = col("t1") + expr(s"INTERVAL $windowHours HOURS")
    var out = Seq((1, steps.head, reached.count()))
    for ((step, idx) <- steps.drop(1).zipWithIndex) {
      reached = ev.filter(col("et") === step)
        .join(reached, "u")
        .filter(col("t") > col("tk") && col("t") <= limit)
        .groupBy("u", "t1").agg(min(col("t")).as("tk"))
      out :+= ((idx + 2, step, reached.count()))
    }
    val spark = events.sparkSession
    import spark.implicits._
    out.toDF("step", "event_type", "users")
  }

  /** Weekly cohort retention: users bucketed by the week of their first
    * event; one row per (cohort_week, week_offset) with the count of
    * cohort members active that week. */
  def retention(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("w"))
    val cohort = ev.groupBy("u").agg(min(col("w")).as("cw"))
    ev.distinct().join(cohort, "u")
      .groupBy(col("cw").as("cohort_week"),
        ((unix_timestamp(col("w")) - unix_timestamp(col("cw"))) /
          lit(604800L)).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
