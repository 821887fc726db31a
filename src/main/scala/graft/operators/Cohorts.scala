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

  def retentionMatrix(spark: SparkSession, dir: String): DataFrame =
    retentionMatrixOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us")))

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
