package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ordered-step funnel analysis over the event log: how many users
  * progressed view → add_to_cart → purchase, where each step must occur
  * STRICTLY AFTER the user's first completion of the previous step (the
  * semantics that distinguishes a funnel from three independent
  * existence checks — a purchase before the first view does not count).
  *
  * Shape: one conditional min-aggregate per step, each keyed by user —
  * step k joins the step-(k−1) timestamps (same key, no re-partitioning
  * pressure at scale; all three aggregations are map-side-combine
  * shuffles on user_id). Timestamps are epoch-micros longs end to end,
  * so the DuckDB twin is exact.
  */
object Funnel {

  val Steps: Seq[String] = Seq("view", "add_to_cart", "purchase")

  def conversionCounts(spark: SparkSession, dir: String): DataFrame =
    conversionCountsOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), lower(col("event_type")).as("et"),
        unix_micros(col("ts")).as("ts_us")))

  /** Step-to-step drop-off rates over [[conversionCounts]] — the number
    * a growth dashboard actually plots (counts are the evidence, rates
    * are the signal). Exact BIGINT→DOUBLE divisions; a zero denominator
    * yields NULL, not NaN (engines disagree on NaN hashing, and "no
    * viewers" has no rate). */
  def dropoffRates(spark: SparkSession, dir: String): DataFrame = {
    def rate(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
    conversionCounts(spark, dir).select(
      col("n_viewed"), col("n_carted_after"), col("n_purchased_after"),
      rate(col("n_carted_after"), col("n_viewed")).as("r_view_to_cart"),
      rate(col("n_purchased_after"), col("n_carted_after"))
        .as("r_cart_to_purchase"),
      rate(col("n_purchased_after"), col("n_viewed"))
        .as("r_view_to_purchase"))
  }

  val HourUs: Long = 3600L * 1000000L
  val CapHours: Long = 72L

  /** Time-to-convert distribution: hours from each user's FIRST view to
    * the first purchase strictly after it, bucketed with a closed top
    * bucket — the funnel's "how fast", shaped like EventGaps (map-side-
    * combinable histogram; no global window, so no quantile sort). */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame =
    timeToConvertOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), lower(col("event_type")).as("et"),
        unix_micros(col("ts")).as("ts_us")))

  /** Core over a pre-projected (user_id, et, ts_us) frame. */
  def timeToConvertOf(ev: DataFrame): DataFrame = {
    val s1 = ev.filter(col("et") === Steps(0))
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    ev.filter(col("et") === Steps(2))
      .join(s1, "user_id").filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min(col("ts_us") - col("t1")).as("delta_us"))
      .select(least(expr(s"delta_us div $HourUs"), lit(CapHours))
        .as("bucket_hr"))
      .groupBy("bucket_hr").agg(count(lit(1)).as("n_users"))
      .orderBy("bucket_hr")
  }

  /** Core over a pre-projected (user_id, et, ts_us) frame — fixture entry. */
  def conversionCountsOf(ev: DataFrame): DataFrame = {
    val s1 = ev.filter(col("et") === Steps(0))
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val s2 = ev.filter(col("et") === Steps(1))
      .join(s1, "user_id").filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"))
    val s3 = ev.filter(col("et") === Steps(2))
      .join(s2, "user_id").filter(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(count(col("t1")).as("n_viewed"),
        count(col("t2")).as("n_carted_after"),
        count(col("t3")).as("n_purchased_after"))
  }
}
