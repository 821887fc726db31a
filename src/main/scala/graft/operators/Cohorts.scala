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
      .localCheckpoint(true) // daily + news both fold this — scan once
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

  /** Hourly-count anomalies per event type: rows where the count is
    * more than 3 standard deviations from that type's mean — with the
    * entire z-test done in INTEGER cross-multiplication:
    *   |x − S/n| > 3·σ  ⟺  (n·x − S)² > 9·(n·Q − S²),  Q = Σx².
    * No division, no sqrt, no float anywhere — the comparison is exact
    * on both engines by construction. All products run in decimal(38,0)
    * (DuckDB computes the same test in HUGEINT): Long arithmetic would
    * silently wrap past n·x ≈ 3·10⁹ per-type hourly mass while the
    * oracle errors — a DIVERGENT failure mode; decimals keep both
    * engines exact through ~10³⁸. */
  def hourlyCountAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(19,0)" // per-column widen BEFORE any multiply
    val c = Tables.load(spark, dir, "events")
      .select(lower(col("event_type")).as("et"),
        expr(s"unix_micros(ts) div ${3600L * 1000000L}").as("hr"))
      .groupBy("et", "hr").agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // tiny (hours × types); read by s AND the join
    val s = c.groupBy("et").agg(
      sum(col("x").cast(dec)).as("s"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("q"),
      count(lit(1)).cast(dec).as("n"))
    val d = col("n") * col("x").cast(dec) - col("s") // decimal(38,0)
    c.join(s, "et")
      .filter(d * d > lit(9).cast(dec) * (col("n") * col("q") -
        col("s") * col("s")))
      .select("et", "hr", "x")
      .orderBy("et", "hr")
  }

  /** Audience overlap between event types: |A∩B|, |A|, |B| and Jaccard
    * for every OBSERVED type pair (inner semantics — disjoint audiences
    * don't emit, mirrored in the oracle). The self-join is user-keyed;
    * per-user fan-out is bounded by the type-vocabulary choose 2 (≤15),
    * so the pair relation is O(users), never quadratic. Sizes are a
    * type-vocabulary-sized relation → broadcast. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    // One pipeline, no self-join: per-user type SETS (bounded by the
    // type vocabulary), pair fan-out in-partition — the basket trick.
    // The previous formulation recomputed the distinct relation three
    // times (sizes + both self-join sides).
    val sets = Tables.load(spark, dir, "events")
      .select(lower(col("event_type")).as("et"), col("user_id"))
      .distinct()
      .groupBy("user_id").agg(sort_array(collect_set(col("et"))).as("ets"))
      .localCheckpoint(true) // two consumers below — scan events once
    val sizes = sets.select(explode(col("ets")).as("et"))
      .groupBy("et").agg(count(lit(1)).as("n"))
    val both = sets.select(explode(flatten(transform(col("ets"),
        e1 => transform(filter(col("ets"), e2 => e2 > e1),
          e2 => struct(e1.as("et1"), e2.as("et2")))))).as("pr"))
      .groupBy(col("pr.et1").as("et1"), col("pr.et2").as("et2"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes.select(col("et").as("et1"), col("n").as("n1"))),
        "et1")
      .join(broadcast(sizes.select(col("et").as("et2"), col("n").as("n2"))),
        "et2")
      .withColumn("jaccard", col("n_both").cast("double") /
        (col("n1") + col("n2") - col("n_both")))
      .select("et1", "et2", "n_both", "n1", "n2", "jaccard")
      .orderBy("et1", "et2")
  }

  /** Core over a pre-projected (user_id, ts_us) frame — fixture entry.
    * ts_us must be non-negative (integer `div` truncation = floor). */
  def retentionMatrixOf(ev: DataFrame): DataFrame = {
    // Per-user first week via an unbounded window min: ONE scan and one
    // user-keyed shuffle (the groupBy-then-join-back twin reads the
    // source twice — the oracle keeps that formulation, same result).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    ev.select(col("user_id"), expr(s"ts_us div $WeekUs").as("week_w"))
      .withColumn("cohort_w", min("week_w").over(w))
      .filter(col("week_w") < col("cohort_w") + MaxOffsetWeeks)
      .select(col("user_id"), col("cohort_w"),
        (col("week_w") - col("cohort_w")).as("week_offset"))
      .distinct()
      .groupBy("cohort_w", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_w", "week_offset")
  }

  /** RFM customer features — the classic e-commerce segmentation triple
    * (days since last order, order count, exact-cents spend) with
    * quintile scores, convention "1 = best" (most recent / most
    * frequent / highest spend). One orders aggregation; the anchor date
    * (corpus max) arrives as a broadcast scalar. The three quintile
    * assignments are ntile semantics with the custkey tie-break
    * (deterministic, engine-identical), computed WITHOUT no-partition
    * ntile windows: each ordering gets an exact global position from
    * the range-partitioned rank (Ranks.withGlobalPos — the distributed
    * zipWithIndex) and the bucket is ntile's closed form over that
    * position, so no task ever sorts more than one range of the
    * customer dimension. */
  def rfmFeatures(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("anchor"))
    val base = o.groupBy(col("o_custkey").as("custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("f"),
        sum(Relational.cents(col("o_totalprice"))).as("m_cents"))
      .crossJoin(broadcast(anchor))
      .select(col("custkey"),
        datediff(col("anchor"), col("last_order")).as("r_days"),
        col("f"), col("m_cents"))
    val ranked = Seq(
      (Seq(col("r_days").asc, col("custkey").asc), "__pr"),
      (Seq(col("f").desc, col("custkey").asc), "__pf"),
      (Seq(col("m_cents").desc, col("custkey").asc), "__pm"))
      .foldLeft(base) { case (df, (keys, pos)) =>
        Ranks.withGlobalPos(df, keys, pos)
      }
    ranked.select(col("custkey"), col("r_days"), col("f"), col("m_cents"),
        Ranks.ntileBucket("__pr", k).as("r_score"),
        Ranks.ntileBucket("__pf", k).as("f_score"),
        Ranks.ntileBucket("__pm", k).as("m_score"))
      .orderBy("custkey")
  }

  /** Day-of-week revenue seasonality — the weekly demand shape behind
    * capacity planning and the seasonal baseline an anomaly monitor
    * normalizes against. Exact integer cents until the one final share
    * division; ISO day numbering (Monday = 1) on both engines. One
    * map-side-combinable aggregation over orders into a ≤7-row
    * relation plus a 1-row total broadcast. */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "orders")
      .groupBy((weekday(to_date(col("o_orderdate"))) + lit(1))
        .cast("bigint").as("dow_iso"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Relational.cents(col("o_totalprice"))).as("rev_cents"))
    val tot = per.agg(sum(col("rev_cents")).as("tot"))
    per.crossJoin(broadcast(tot))
      .select(col("dow_iso"), col("n_orders"), col("rev_cents"),
        (col("rev_cents").cast("double") / col("tot")).as("revenue_share"))
      .orderBy("dow_iso")
  }

  /** Month-over-month revenue trend: per calendar month, order count,
    * exact-cents revenue, and the growth ratio vs the previous month
    * (NULL for the first month — no fake zero). The lag window runs
    * over the months relation (bounded by the date range, never the
    * fact table); revenue stays integer cents until the one final
    * ratio division. */
  def monthlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("month")
    Tables.load(spark, dir, "orders")
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Relational.cents(col("o_totalprice"))).as("rev_cents"))
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .select(col("month"), col("n_orders"), col("rev_cents"),
        (col("rev_cents").cast("double") / col("prev_cents"))
          .as("growth_ratio"))
      .orderBy("month")
  }

  /** Temporal concept-drift monitor: each event type's share of traffic
    * in the early vs the late half of the stream (midpoint of the
    * observed time range), with the absolute share difference per type —
    * the table a pipeline watches to catch a source whose behavior mix
    * shifts under it. The half boundary is the exact integer test
    * us·2 < lo+hi (no division, no rounding rule to match); counts stay
    * integers until the two final share divisions. One scan plus a
    * 1-row broadcast of the range; the per-type relation is bounded by
    * the type vocabulary. */
  def eventTypeDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(lower(col("event_type")).as("et"),
        unix_micros(col("ts")).as("us"))
    val mm = ev.agg(min("us").as("lo"), max("us").as("hi"))
    val perType = ev.crossJoin(broadcast(mm))
      .select(col("et"), (col("us") * 2 < col("lo") + col("hi")).as("early"))
      .groupBy("et").agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("n_early"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("n_late"))
    val tot = perType.agg(sum("n_early").as("ne"), sum("n_late").as("nl"))
    perType.crossJoin(broadcast(tot))
      .select(col("et"), col("n_early"), col("n_late"),
        abs(col("n_early").cast("double") / col("ne") -
          col("n_late").cast("double") / col("nl")).as("share_diff"))
      .orderBy("et")
  }
}
