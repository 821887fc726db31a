package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series resampling with forward fill — the gap-filling operator a
  * metrics/feature pipeline runs before any fixed-step model sees the
  * data (absent from the reference, like the as-of join it builds on).
  *
  * Per user: a regular grid from the user's first event (floored to the
  * grid step) to their last, each tick carrying the value of the most
  * recent event at-or-before it. Implementation is the AsofJoin
  * merge-union shape, not a grid×events join: generate ticks from the
  * per-user span (one aggregate), union with the events, and
  * carry-forward with a windowed last(ignoreNulls). One shuffle + sort;
  * grid size is span/step per user, never |grid|×|events|.
  *
  * Determinism: events are pre-reduced to one row per (user, ts) keeping
  * the max-event_id's value; events sort before ticks at equal ts
  * (tag 0 < 1) for the inclusive `tick >= event.ts` semantics of
  * DuckDB's ASOF JOIN — the oracle. A tick before the user's first
  * event (floor misalignment) is honestly null, exactly as ASOF LEFT
  * JOIN leaves it.
  */
object Resample {

  /** 6-hour grid step in epoch micros. */
  val StepUs: Long = 6L * 3600 * 1000000

  def eventValuesFfill(spark: SparkSession, dir: String): DataFrame =
    eventValuesFfillOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value")))

  /** Core over (user_id, ts_us, event_id, value) rows. */
  def eventValuesFfillOf(events: DataFrame): DataFrame = {
    // One row per (user, ts): last-writer (max event_id) wins — without
    // this, equal-timestamp events make the fill nondeterministic.
    // Carry a non-null STRUCT per event row (grid rows carry null), so
    // last(ignoreNulls) picks the latest EVENT even when its value is
    // genuinely NULL — matching the ASOF oracle, which returns the
    // matched row's null rather than skipping back to an older value.
    val ev = events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "ts_us").orderBy(desc("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        struct(col("value").cast("double").as("v")).as("carry"))
    val grid = ev.groupBy("user_id")
      .agg(min("ts_us").as("mn"), max("ts_us").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn") - col("mn") % StepUs, col("mx"),
          lit(StepUs))).as("ts_us"),
        lit(1).as("tag"),
        lit(null).cast("struct<v:double>").as("carry"))
    val w = Window.partitionBy("user_id")
      .orderBy("ts_us", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(grid)
      .withColumn("filled", last("carry", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("ts_us").as("tick_us"),
        col("filled.v").as("value"))
      .orderBy("user_id", "tick_us")
  }

  /** Exponentially-weighted moving average of daily order revenue with
    * α = 1/2 — the smoothing a metrics pipeline layers on any daily KPI.
    *
    * α is HALF on purpose: the recurrence y_i = (y_{i−1} + x_i)·0.5
    * (y_0 = 0) is one IEEE add and one EXACT power-of-two scaling per
    * step, so running the identical left fold over the identical
    * day-ordered list on both engines is bit-reproducible — no pow(),
    * no float literal drift, no re-association. Inputs are exact
    * integer cents; the single /100 presentation division happens after
    * the fold on both sides.
    *
    * Shape: the daily aggregation is the scalable part (one partial-agg
    * shuffle over orders). The smoothing then runs on the BOUNDED daily
    * series (|days| is calendar-bounded regardless of corpus size), so
    * the unpartitioned prefix window and its O(|days|²) collected terms
    * are a deliberate small-series trade for engine-exact parity — a
    * production pipeline streams the recurrence over the same sorted
    * series in one pass. */
  def ewmaDailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Relational.cents(col("o_totalprice"))).as("cents"))
    val prefix = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("terms", collect_list(col("cents").cast("double"))
        .over(prefix))
      .select(col("day"), col("n_orders"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        (aggregate(col("terms"), lit(0.0),
          (acc, x) => (acc + x) * lit(0.5)) / lit(100.0))
          .as("ewma_revenue"))
      .orderBy("day")
  }
}
