package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Inter-event time distribution: LAG over each user's event sequence,
  * gaps bucketed to whole minutes with a closed top bucket. All
  * arithmetic is integer micros, so the DuckDB twin is exact.
  *
  * Scale shape: the window is partitioned by user_id — per-user state
  * only, no global sort — and the histogram aggregation is a map-side-
  * combinable count on at most `CapMinutes`+1 distinct buckets.
  * (event_id in the ORDER BY makes equal-timestamp sequences a total
  * order, which the oracle hash-compare requires.)
  */
object EventGaps {

  val BucketUs: Long = 60L * 1000000L
  val CapMinutes: Long = 60L

  def gapHistogram(spark: SparkSession, dir: String): DataFrame =
    gapHistogramOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id")))

  /** SCD2 intervalization of the behavioral log: each (user, product)
    * interaction becomes a validity interval [ts, next interaction ts)
    * — LEAD over the per-key sequence, null valid_to marking the
    * current state. The window is keyed by (user, product): per-key
    * state only, no global sort; event_id makes equal-timestamp
    * sequences a total order on both engines. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "k").orderBy("ts_us", "event_id")
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        lower(col("event_type")).as("state"),
        unix_micros(col("ts")).as("valid_from_us"))
      .filter(col("k").isNotNull)
      .withColumn("ts_us", col("valid_from_us"))
      .withColumn("valid_to_us", lead("ts_us", 1).over(w))
      .select(col("user_id"), col("k").as("product_id"), col("event_id"),
        col("state"), col("valid_from_us"), col("valid_to_us"))
      .orderBy("user_id", "product_id", "valid_from_us", "event_id")
  }

  /** Core over a pre-projected (user_id, ts_us, event_id) frame. */
  def gapHistogramOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.select((col("ts_us") - lag("ts_us", 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
      .select(least(expr(s"gap div $BucketUs"), lit(CapMinutes))
        .as("bucket_min"))
      .groupBy("bucket_min").agg(count(lit(1)).as("n"))
      .orderBy("bucket_min")
  }
}
