package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Weekly cohort retention: users grouped by the week of their FIRST
  * event; for each cohort, how many distinct users were active 0..7
  * weeks later. All arithmetic is integer (epoch-micros `div` a fixed
  * week), so the DuckDB twin is exact.
  *
  * Scale shape: first-event week and per-user activity are both keyed
  * by user_id — one shuffle produces `first`, the join back is
  * same-key (co-partitioned under AQE), and the matrix aggregation
  * runs on the (cohort, offset) pairs AFTER the per-user distinct, so
  * its input is bounded by |users| × 8, not |events|.
  */
object Cohorts {

  val WeekUs: Long = 7L * 24 * 3600 * 1000000L
  val MaxOffsetWeeks: Int = 8
  val DayUs: Long = 24L * 3600 * 1000000L

  def retentionMatrix(spark: SparkSession, dir: String): DataFrame =
    retentionMatrixOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")))

  def dauCumulative(spark: SparkSession, dir: String): DataFrame =
    dauCumulativeOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")))

  /** Daily active users + new users + cumulative distinct users, all
    * exact: cumulative distinct at day d = Σ first-day counts ≤ d (the
    * first-activity trick — no running distinct state). The only
    * unpartitioned window runs over the per-DAY frame, whose size is
    * the calendar span, not the event count — fine at any data scale. */
  def dauCumulativeOf(ev: DataFrame): DataFrame = {
    val act = ev.select(col("user_id"),
      expr(s"ts_us div $DayUs").as("day")).distinct()
    val daily = act.groupBy("day").agg(count(lit(1)).as("n_active"))
    val news = act.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    daily.join(news, Seq("day"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("cum_users", sum("n_new").over(w))
      .orderBy("day")
  }

  /** Core over a pre-projected (user_id, ts_us) frame — fixture entry.
    * ts_us must be non-negative (integer `div` truncation = floor). */
  def retentionMatrixOf(ev: DataFrame): DataFrame = {
    val week = ev.select(col("user_id"),
      expr(s"ts_us div $WeekUs").as("week_w"))
    val first = week.groupBy("user_id").agg(min("week_w").as("cohort_w"))
    week.join(first, "user_id")
      .filter(col("week_w") < col("cohort_w") + MaxOffsetWeeks)
      .select(col("user_id"), col("cohort_w"),
        (col("week_w") - col("cohort_w")).as("week_offset"))
      .distinct()
      .groupBy("cohort_w", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_w", "week_offset")
  }
}
