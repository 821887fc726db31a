package graft.operators

import graft.Registry

/** Registry + DuckDB oracle twins for the scalar relational surface. */
object RelationalRegistry {
  private val LookupKey = 42L

  /** The strictly-after funnel CTE chain, shared by the conversion and
    * drop-off oracles (ev feeds three branches and s1/s2 are each read
    * twice → MATERIALIZED, the CTE re-inlining gotcha). */
  private val FunnelCtes =
    """ev AS MATERIALIZED (
      |  SELECT user_id, lower(event_type) AS et,
      |    epoch_ns(ts) // 1000 AS ts_us FROM events),
      |s1 AS MATERIALIZED (
      |  SELECT user_id, min(ts_us) AS t1 FROM ev
      |  WHERE et = 'view' GROUP BY 1),
      |s2 AS MATERIALIZED (
      |  SELECT ev.user_id, min(ts_us) AS t2 FROM ev
      |  JOIN s1 USING (user_id)
      |  WHERE et = 'add_to_cart' AND ts_us > t1 GROUP BY 1),
      |s3 AS (
      |  SELECT ev.user_id, min(ts_us) AS t3 FROM ev
      |  JOIN s2 USING (user_id)
      |  WHERE et = 'purchase' AND ts_us > t2 GROUP BY 1)""".stripMargin

  val registry: Registry = Registry(
    queries = Map(
      "scan_project" -> ((s, d) => Relational.scanProject(s, d)),
      "point_lookup" -> ((s, d) => Relational.pointLookup(s, d, LookupKey)),
      "filter_enum_counts" -> ((s, d) => Relational.filterEnumCounts(s, d)),
      "project_cast_literal" -> ((s, d) => Relational.projectCastLiteral(s, d)),
      "distinct_projection" -> ((s, d) => Relational.distinctProjection(s, d)),
      "scalar_count" -> ((s, d) => Relational.scalarCount(s, d)),
      "dedup_last_write" -> ((s, d) => Relational.dedupLastWrite(s, d)),
      "topk_orders" -> ((s, d) => Relational.topkOrders(s, d)),
      "limit_preview" -> ((s, d) => Relational.limitPreview(s, d)),
      "event_relabel" -> ((s, d) => Relational.eventRelabel(s, d)),
      "health" -> ((s, d) => Relational.health(s, d)),
      "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
      "sql_api_q1" -> ((s, d) => Relational.sqlApiQ1(s, d)),
      "json_props_extract" -> ((s, d) => Json.propsExtract(s, d)),
      "rollup_pricing" -> ((s, d) => Relational.rollupPricing(s, d)),
      "cube_pricing" -> ((s, d) => Relational.cubePricing(s, d)),
      "pivot_event_matrix" -> ((s, d) => Relational.pivotEventMatrix(s, d)),
      "median_price_per_brand" -> ((s, d) =>
        Relational.medianPricePerBrand(s, d)),
      "percentiles_price_per_brand" -> ((s, d) =>
        Relational.pricePercentilesPerBrand(s, d)),
      "multi_distinct_stats" -> ((s, d) =>
        Relational.multiDistinctStats(s, d)),
      "approx_distinct" -> ((s, d) => Relational.approxDistinct(s, d)),
      // The sketch tier's declared accuracy contracts as one
      // hash-checkable frame (the graphx_float_audit pattern): HLL ±5%,
      // percentile_approx rank-error ≤ 1/accuracy, CMS no-undercount +
      // ≤ ε·N overcount. Deterministic under the fixed seeds.
      "sketch_audit" -> ((s, d) => Relational.sketchAudit(s, d)),
      "asof_event_order" -> ((s, d) => AsofJoin.eventsToLastOrder(s, d)),
      "resample_ffill" -> ((s, d) => Resample.eventValuesFfill(s, d)),
      "ewma_daily_revenue" -> ((s, d) => Resample.ewmaDailyRevenue(s, d)),
      "range_event_orders" -> ((s, d) => RangeJoin.eventsNearOrders(s, d)),
      "set_ops" -> ((s, d) => Relational.setOps(s, d)),
      // Salting must never change an answer: the oracles are the PLAIN
      // unsalted formulations.
      "skew_salted_counts" -> ((s, d) => Skew.saltedEventCounts(s, d)),
      "skew_salted_join_counts" -> ((s, d) => Skew.saltedBrandCounts(s, d)),
      // Bloom pruning must never change an answer: the oracle is the
      // PLAIN join (false positives die in the exact join).
      "join_bloom_pruned" -> ((s, d) => Pruning.bloomPrunedBrandVolume(s, d)),
      // A/B report: one shared SQL text on both engines (sql_api_*
      // discipline) — per-factor double casts keep chi2 overflow-free
      // and bit-identical.
      "ab_conversion_report" -> ((s, d) => Experiment.abConversionReport(s, d)),
      "outer_nation_counts" -> ((s, d) => Relational.nationCustomerCounts(s, d)),
      "window_top_per_brand" -> ((s, d) => Relational.topProductsPerBrand(s, d)),
      "fuzzy_part_names" -> ((s, d) => Relational.fuzzyPartNames(s, d)),
      "funnel_conversion" -> ((s, d) => Funnel.conversionCounts(s, d)),
      "funnel_time_to_convert" -> ((s, d) => Funnel.timeToConvert(s, d)),
      "funnel_dropoff" -> ((s, d) => Funnel.dropoffRates(s, d)),
      "event_transitions" -> ((s, d) => Transitions.eventTransitions(s, d)),
      "cohort_retention" -> ((s, d) => Cohorts.retentionMatrix(s, d)),
      "rfm_features" -> ((s, d) => Cohorts.rfmFeatures(s, d)),
      "revenue_dow_seasonality" -> ((s, d) => Cohorts.dowSeasonality(s, d)),
      "revenue_monthly_growth" -> ((s, d) => Cohorts.monthlyGrowth(s, d)),
      "audience_overlap" -> ((s, d) => Cohorts.audienceOverlap(s, d)),
      "hourly_count_anomalies" -> ((s, d) =>
        Cohorts.hourlyCountAnomalies(s, d)),
      "event_type_drift" -> ((s, d) => Cohorts.eventTypeDrift(s, d)),
      "incremental_agg_merge" -> ((s, d) =>
        Relational.incrementalAggMerge(s, d)),
      "profile_orders" -> ((s, d) => Relational.profileOrders(s, d)),
      "fk_integrity" -> ((s, d) => Relational.fkIntegrityReport(s, d)),
      "event_gap_histogram" -> ((s, d) => EventGaps.gapHistogram(s, d)),
      "scd2_intervals" -> ((s, d) => EventGaps.scd2Intervals(s, d)),
      "dau_cumulative" -> ((s, d) => Cohorts.dauCumulative(s, d)),
      "q3_shipping_priority" -> ((s, d) => Relational.q3Shipping(s, d)),
      "orders_above_cust_avg" -> ((s, d) =>
        Relational.ordersAboveCustomerAvg(s, d)),
      "approx_quantiles" -> ((s, d) => Relational.approxQuantiles(s, d)),
      "quantiles_global_exact" -> ((s, d) =>
        Relational.quantilesGlobalExact(s, d))
    ),
    oracles = Map(
      "scan_project" ->
        "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
      "point_lookup" ->
        s"SELECT * FROM part WHERE p_partkey = $LookupKey ORDER BY p_partkey",
      "filter_enum_counts" ->
        """SELECT event_type, count(*) AS n FROM events
          |WHERE event_type IN ('view','click','purchase')
          |GROUP BY event_type ORDER BY event_type""".stripMargin,
      "project_cast_literal" ->
        """SELECT o_orderkey AS id, CAST(o_custkey AS DOUBLE) AS score,
          |'projected' AS reason FROM orders ORDER BY id LIMIT 100""".stripMargin,
      "distinct_projection" ->
        "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
      "scalar_count" ->
        "SELECT count(*) AS products FROM part",
      "dedup_last_write" ->
        """SELECT user_id, event_id, event_type FROM events
          |QUALIFY row_number() OVER (PARTITION BY user_id
          |  ORDER BY (epoch_ns(ts) // 1000) DESC, event_id DESC) = 1
          |ORDER BY user_id""".stripMargin,
      "topk_orders" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
      "limit_preview" ->
        "SELECT * FROM orders ORDER BY o_orderkey LIMIT 5",
      "event_relabel" ->
        """SELECT event_id,
          |CASE lower(event_type)
          |  WHEN 'view' THEN 'VIEWED' WHEN 'click' THEN 'CLICKED'
          |  WHEN 'add_to_cart' THEN 'ADDED_TO_CART'
          |  WHEN 'purchase' THEN 'PURCHASED' WHEN 'signup' THEN 'SIGNED_UP'
          |  WHEN 'error' THEN 'ERRORED' END AS rel_type
          |FROM events
          |WHERE lower(event_type) IN ('view','click','add_to_cart','purchase','signup','error')
          |ORDER BY event_id""".stripMargin,
      "health" ->
        "SELECT CAST(1 AS BIGINT) AS ok",
      "q1_pricing_summary" ->
        """WITH li AS (SELECT l_returnflag, l_linestatus,
          |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
          |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
          |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
          |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
          |SELECT l_returnflag, l_linestatus,
          |  sum(qty_c) / CAST(100 AS DOUBLE) AS sum_qty,
          |  sum(price_c) / CAST(100 AS DOUBLE) AS sum_base_price,
          |  sum(price_c * (100 - disc_c)) / CAST(10000 AS DOUBLE)
          |    AS sum_disc_price,
          |  count(*) AS count_order
          |FROM li
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      // Same DuckDB twin as q1 — the Spark side differs only in entering
      // through spark.sql text instead of the DataFrame API.
      "sql_api_q1" ->
        """WITH li AS (SELECT l_returnflag, l_linestatus,
          |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
          |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
          |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
          |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
          |SELECT l_returnflag, l_linestatus,
          |  sum(qty_c) / CAST(100 AS DOUBLE) AS sum_qty,
          |  sum(price_c) / CAST(100 AS DOUBLE) AS sum_base_price,
          |  sum(price_c * (100 - disc_c)) / CAST(10000 AS DOUBLE)
          |    AS sum_disc_price,
          |  count(*) AS count_order
          |FROM li
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "json_props_extract" ->
        """WITH e AS (SELECT event_type,
          |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |FROM events)
          |SELECT event_type, count(*) AS n_events, count(k) AS n_with_k,
          |  min(k) AS min_k, max(k) AS max_k
          |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
      "rollup_pricing" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  sum(CAST(round(l_quantity * 100) AS BIGINT))
          |    / CAST(100 AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "cube_pricing" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  sum(CAST(round(l_quantity * 100) AS BIGINT))
          |    / CAST(100 AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY CUBE(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "pivot_event_matrix" -> {
        val conds = Relational.EventTypes.map(t =>
          s"count(CASE WHEN lower(event_type) = '$t' THEN 1 END) AS \"$t\"")
          .mkString(",\n|  ")
        s"""SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
           |  $conds
           |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin
      },
      // approx_distinct: rows-only (HLL sketches differ across engines)
      // — but its accuracy CONTRACT is oracle-green via sketch_audit:
      "sketch_audit" ->
        """SELECT * FROM (VALUES ('cms', true), ('hll', true),
          |  ('quantiles', true)) t(family, agrees)
          |ORDER BY family""".stripMargin,
      // The same ⌊(n+1)/2⌋ row_number formulation on both sides — native
      // median()/quantile() interpolation differs across engines.
      "median_price_per_brand" ->
        """SELECT p_brand AS brand, p_retailprice AS median_price
          |FROM part
          |QUALIFY row_number() OVER (PARTITION BY p_brand
          |    ORDER BY p_retailprice, p_partkey)
          |  = (count(*) OVER (PARTITION BY p_brand) + 1) // 2
          |ORDER BY brand""".stripMargin,
      // Discrete ⌈p·n⌉ rank picks — no interpolation, engine-portable.
      "percentiles_price_per_brand" ->
        """WITH r AS (SELECT p_brand AS brand, p_retailprice AS v,
          |    row_number() OVER (PARTITION BY p_brand
          |      ORDER BY p_retailprice, p_partkey) AS rn,
          |    count(*) OVER (PARTITION BY p_brand) AS n
          |  FROM part)
          |SELECT brand,
          |  max(CASE WHEN rn = (n * 10 + 99) // 100 THEN v END) AS p10,
          |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS p50,
          |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN v END) AS p90
          |FROM r GROUP BY brand ORDER BY brand""".stripMargin,
      "multi_distinct_stats" ->
        """SELECT p_brand AS brand,
          |  count(DISTINCT p_size) AS n_sizes,
          |  count(DISTINCT p_type) AS n_types,
          |  count(*) AS n_parts,
          |  sum(CAST(round(p_retailprice * 100) AS BIGINT))
          |    / CAST(100 AS DOUBLE) AS sum_price
          |FROM part GROUP BY 1 ORDER BY brand""".stripMargin,
      // EWMA with α=1/2: identical left fold (acc+x)·0.5 over the
      // identical day-ordered cents list on both engines — power-of-two
      // scaling is exact, so the doubles are bit-identical; /100 is a
      // single presentation division after the fold. list_reduce seeds
      // from the first element, hence the prepended 0.
      "ewma_daily_revenue" ->
        """WITH daily AS (
          |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
          |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |      AS BIGINT) AS cents
          |  FROM orders GROUP BY 1),
          |s AS (
          |  SELECT day, n_orders, cents,
          |    list(CAST(cents AS DOUBLE))
          |      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS terms
          |  FROM daily)
          |SELECT day, n_orders,
          |  CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
          |  list_reduce(list_prepend(CAST(0 AS DOUBLE), terms),
          |    (acc, x) -> (acc + x) * CAST(0.5 AS DOUBLE))
          |    / CAST(100 AS DOUBLE) AS ewma_revenue
          |FROM s ORDER BY day""".stripMargin,
      // grid ticks ASOF-joined to the deduped event series; the Spark
      // side is the merge-union carry-forward of the same semantics.
      "resample_ffill" ->
        s"""WITH ev AS (
           |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, value
           |  FROM events
           |  QUALIFY row_number() OVER (
           |    PARTITION BY user_id, epoch_ns(ts) // 1000
           |    ORDER BY event_id DESC) = 1),
           |s AS (SELECT user_id, min(ts_us) AS mn, max(ts_us) AS mx
           |      FROM ev GROUP BY 1),
           |grid AS (SELECT user_id,
           |  unnest(generate_series(mn - mn % ${Resample.StepUs}, mx,
           |    ${Resample.StepUs})) AS tick_us FROM s)
           |SELECT g.user_id, g.tick_us, e.value
           |FROM grid g ASOF LEFT JOIN ev e
           |  ON g.user_id = e.user_id AND g.tick_us >= e.ts_us
           |ORDER BY g.user_id, g.tick_us""".stripMargin,
      "asof_event_order" ->
        """WITH ord AS (
          |  SELECT o_custkey AS user_id,
          |    epoch_ns(o_orderdate) // 1000 AS ts_us,
          |    max(o_orderkey) AS order_id
          |  FROM orders GROUP BY 1, 2),
          |ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
          |       FROM events)
          |SELECT e.event_id, e.user_id, e.ts_us, o.order_id
          |FROM ev e ASOF LEFT JOIN ord o
          |  ON e.user_id = o.user_id AND e.ts_us >= o.ts_us
          |ORDER BY event_id""".stripMargin,
      "range_event_orders" ->
        s"""WITH ord AS (SELECT o_custkey AS user_id, o_orderkey,
           |    epoch_ns(o_orderdate) // 1000 AS ots FROM orders),
           |ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ets
           |       FROM events)
           |SELECT e.event_id, e.user_id, count(*) AS n_orders_near,
           |  min(abs(e.ets - o.ots)) AS closest_us
           |FROM ev e JOIN ord o ON e.user_id = o.user_id
           |  AND abs(e.ets - o.ots) <= ${14L * 24 * 3600 * 1000000L}
           |GROUP BY e.event_id, e.user_id
           |ORDER BY event_id""".stripMargin,
      "window_top_per_brand" ->
        """SELECT p_brand, rk, p_partkey, p_name, p_retailprice FROM (
          |  SELECT p_brand, p_partkey, p_name, p_retailprice,
          |    CAST(row_number() OVER (PARTITION BY p_brand
          |      ORDER BY p_retailprice DESC, p_partkey ASC) AS BIGINT) AS rk
          |  FROM part)
          |WHERE rk <= 3
          |ORDER BY p_brand, rk""".stripMargin,
      "fuzzy_part_names" ->
        """SELECT p_partkey, p_name,
          |  CAST(levenshtein(p_name, 'spring green yellow purple cornsilk') AS BIGINT) AS dist
          |FROM part
          |ORDER BY dist ASC, p_partkey ASC
          |LIMIT 10""".stripMargin,
      "outer_nation_counts" ->
        """SELECT n_nationkey, n_name,
          |  coalesce(c.n_customers, 0) AS n_customers
          |FROM nation LEFT OUTER JOIN
          |  (SELECT c_nationkey, count(*) AS n_customers
          |   FROM customer GROUP BY c_nationkey) c
          |  ON n_nationkey = c_nationkey
          |ORDER BY n_nationkey""".stripMargin,
      "skew_salted_counts" ->
        """SELECT event_type, count(*) AS n FROM events
          |GROUP BY event_type ORDER BY event_type""".stripMargin,
      "skew_salted_join_counts" ->
        """WITH e AS (SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |           FROM events)
          |SELECT p_brand, count(*) AS n
          |FROM e JOIN part ON k = p_partkey
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
      "ab_conversion_report" -> Experiment.AbSql("events"),
      "join_bloom_pruned" ->
        s"""SELECT p_brand, count(*) AS n,
           |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           |    AS BIGINT) AS revenue_c
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_size <= ${Pruning.SizeCap}
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
      // Decorrelated "above own group average": integer cross-multiply,
      // no division. DuckDB sum(BIGINT)=HUGEINT compares exactly.
      "orders_above_cust_avg" ->
        """WITH o AS (SELECT o_orderkey, o_custkey, o_orderpriority,
          |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
          |  FROM orders),
          |s AS (SELECT o_custkey, sum(price_c) AS sum_c, count(*) AS cnt
          |      FROM o GROUP BY 1)
          |SELECT o_orderpriority, count(*) AS n_above
          |FROM o JOIN s USING (o_custkey)
          |WHERE price_c * cnt > sum_c
          |GROUP BY 1 ORDER BY 1""".stripMargin,
      // DAU + cumulative distinct users via the first-activity trick;
      // DuckDB window sum(BIGINT) is HUGEINT → cast back.
      "dau_cumulative" ->
        s"""WITH act AS MATERIALIZED (
           |  SELECT DISTINCT user_id,
           |    (epoch_ns(ts) // 1000) // ${Cohorts.DayUs} AS day FROM events),
           |daily AS (SELECT day, count(*) AS n_active FROM act GROUP BY 1),
           |news AS (SELECT day, count(*) AS n_new FROM (
           |    SELECT user_id, min(day) AS day FROM act GROUP BY 1)
           |  GROUP BY 1)
           |SELECT day, n_active, coalesce(n_new, 0) AS n_new,
           |  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY day
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
           |FROM daily LEFT JOIN news USING (day)
           |ORDER BY day""".stripMargin,
      "q3_shipping_priority" ->
        """WITH li AS (SELECT l_orderkey,
          |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
          |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
          |  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01')
          |SELECT l_orderkey,
          |  epoch_ns(o_orderdate) // 1000 AS order_date_us,
          |  o_orderpriority,
          |  sum(price_c * (100 - disc_c)) / CAST(10000 AS DOUBLE) AS revenue
          |FROM li
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-06-01'
          |GROUP BY 1, 2, 3
          |ORDER BY revenue DESC, order_date_us ASC, l_orderkey ASC
          |LIMIT 10""".stripMargin,
      // SCD2 intervalization: LEAD per (user, product); event_id makes
      // equal-ts sequences total on both engines.
      "scd2_intervals" ->
        """WITH ch AS (SELECT user_id, event_id,
          |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |    lower(event_type) AS state,
          |    epoch_ns(ts) // 1000 AS ts_us
          |  FROM events)
          |SELECT user_id, k AS product_id, event_id, state,
          |  ts_us AS valid_from_us,
          |  lead(ts_us) OVER (PARTITION BY user_id, k
          |    ORDER BY ts_us, event_id) AS valid_to_us
          |FROM ch WHERE k IS NOT NULL
          |ORDER BY user_id, product_id, valid_from_us, event_id""".stripMargin,
      // LAG inter-event gaps, minute buckets, closed top bucket; all
      // integer micros. (ts_us, event_id) is a per-user total order on
      // both sides.
      "event_gap_histogram" ->
        s"""WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
           |    event_id FROM events),
           |g AS (SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id
           |    ORDER BY ts_us, event_id) AS gap FROM ev)
           |SELECT least(gap // ${EventGaps.BucketUs}, ${EventGaps.CapMinutes})
           |    AS bucket_min,
           |  count(*) AS n
           |FROM g WHERE gap IS NOT NULL
           |GROUP BY 1 ORDER BY 1""".stripMargin,
      // Weekly cohort retention matrix; integer week arithmetic (`div` ↔
      // `//`, both floor for non-negative epoch-micros) keeps it exact.
      "cohort_retention" ->
        s"""WITH ev AS MATERIALIZED (
           |  SELECT user_id, (epoch_ns(ts) // 1000) // ${Cohorts.WeekUs}
           |    AS week_w FROM events),
           |first AS (SELECT user_id, min(week_w) AS cohort_w
           |          FROM ev GROUP BY 1),
           |act AS (SELECT DISTINCT ev.user_id, cohort_w,
           |    week_w - cohort_w AS week_offset
           |  FROM ev JOIN first USING (user_id)
           |  WHERE week_w < cohort_w + ${Cohorts.MaxOffsetWeeks})
           |SELECT cohort_w, week_offset, count(*) AS n_users
           |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      // First-view → first-later-purchase latency histogram (hours,
      // closed top bucket). Integer micros end to end.
      "funnel_time_to_convert" ->
        s"""WITH ev AS MATERIALIZED (
           |  SELECT user_id, lower(event_type) AS et,
           |    epoch_ns(ts) // 1000 AS ts_us FROM events),
           |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
           |       WHERE et = 'view' GROUP BY 1),
           |conv AS (SELECT ev.user_id, min(ts_us - t1) AS delta_us
           |  FROM ev JOIN s1 USING (user_id)
           |  WHERE et = 'purchase' AND ts_us > t1 GROUP BY 1)
           |SELECT least(delta_us // ${Funnel.HourUs}, ${Funnel.CapHours})
           |    AS bucket_hr,
           |  count(*) AS n_users
           |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,
      // 3σ z-test by integer cross-multiplication — no float anywhere.
      // DuckDB's sums are HUGEINT; cast back so both engines compare
      // the same 64-bit products.
      "hourly_count_anomalies" ->
        s"""WITH c AS (SELECT lower(event_type) AS et,
           |    (epoch_ns(ts) // 1000) // ${3600L * 1000000L} AS hr,
           |    count(*) AS x
           |  FROM events GROUP BY 1, 2),
           |s AS (SELECT et, CAST(sum(x) AS BIGINT) AS s,
           |    CAST(sum(x * x) AS BIGINT) AS q, count(*) AS n
           |  FROM c GROUP BY 1)
           |SELECT c.et, hr, x FROM c JOIN s ON c.et = s.et
           |WHERE (n * x - s.s) * (n * x - s.s) > 9 * (n * q - s.s * s.s)
           |ORDER BY c.et, hr""".stripMargin,
      // Early/late half boundary via the exact integer test us·2 < lo+hi
      // (no division to round); the two share divisions are the only
      // floats.
      "event_type_drift" ->
        """WITH ev AS (SELECT lower(event_type) AS et,
          |    epoch_ns(ts) // 1000 AS us FROM events),
          |mm AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
          |pt AS (SELECT et,
          |  CAST(sum(CASE WHEN us * 2 < lo + hi THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_early,
          |  CAST(sum(CASE WHEN us * 2 < lo + hi THEN 0 ELSE 1 END)
          |    AS BIGINT) AS n_late
          |  FROM ev, mm GROUP BY et),
          |t AS (SELECT CAST(sum(n_early) AS BIGINT) AS ne,
          |  CAST(sum(n_late) AS BIGINT) AS nl FROM pt)
          |SELECT et, n_early, n_late,
          |  abs(CAST(n_early AS DOUBLE) / ne - CAST(n_late AS DOUBLE) / nl)
          |    AS share_diff
          |FROM pt, t ORDER BY et""".stripMargin,
      // Observed-pair audience overlap; the one double division is
      // engine-portable.
      "audience_overlap" ->
        """WITH a AS MATERIALIZED (
          |  SELECT DISTINCT lower(event_type) AS et, user_id FROM events),
          |sizes AS (SELECT et, count(*) AS n FROM a GROUP BY 1),
          |ov AS (SELECT x.et AS et1, y.et AS et2, count(*) AS n_both
          |  FROM a x JOIN a y ON x.user_id = y.user_id AND x.et < y.et
          |  GROUP BY 1, 2)
          |SELECT et1, et2, n_both, s1.n AS n1, s2.n AS n2,
          |  CAST(n_both AS DOUBLE) / (s1.n + s2.n - n_both) AS jaccard
          |FROM ov JOIN sizes s1 ON et1 = s1.et
          |JOIN sizes s2 ON et2 = s2.et
          |ORDER BY et1, et2""".stripMargin,
      // One profiling scan unpivoted; the oracle is the per-column UNION.
      "profile_orders" -> {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        cols.map(c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  count(*) - count($c) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },
      // RFM: ntile's row-position semantics + custkey tie-breaks make
      // the quintiles deterministic and identical across engines.
      "rfm_features" ->
        """WITH base AS (SELECT o_custkey AS custkey,
          |  CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
          |    (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
          |    AS INTEGER) AS r_days,
          |  count(*) AS f,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |    AS m_cents
          |FROM orders GROUP BY 1)
          |SELECT custkey, r_days, f, m_cents,
          |  CAST(ntile(5) OVER (ORDER BY r_days, custkey) AS INTEGER)
          |    AS r_score,
          |  CAST(ntile(5) OVER (ORDER BY f DESC, custkey) AS INTEGER)
          |    AS f_score,
          |  CAST(ntile(5) OVER (ORDER BY m_cents DESC, custkey) AS INTEGER)
          |    AS m_score
          |FROM base ORDER BY custkey""".stripMargin,
      // Month lag over the bounded months relation; first month NULL.
      "revenue_monthly_growth" ->
        """WITH p AS (SELECT
          |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |    AS rev_cents
          |FROM orders GROUP BY 1)
          |SELECT CAST(month AS DATE) AS month, n_orders, rev_cents,
          |  CAST(rev_cents AS DOUBLE) /
          |    lag(rev_cents, 1) OVER (ORDER BY month) AS growth_ratio
          |FROM p ORDER BY month""".stripMargin,
      // ISO day numbering on both engines (Monday = 1); exact cents
      // until the one final share division.
      "revenue_dow_seasonality" ->
        """WITH p AS (SELECT
          |  CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow_iso,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |    AS rev_cents
          |FROM orders GROUP BY 1),
          |t AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS tot FROM p)
          |SELECT dow_iso, n_orders, rev_cents,
          |  CAST(rev_cents AS DOUBLE) / tot AS revenue_share
          |FROM p, t ORDER BY dow_iso""".stripMargin,
      // FK orphans per relation: LEFT JOIN the distinct parent keys (a
      // NULL child key never matches → orphan, mirrored in both engines).
      "fk_integrity" -> {
        val fks = Seq(
          ("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          ("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          ("nation.n_regionkey->region", "nation", "n_regionkey",
            "region", "r_regionkey"),
          ("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey"))
        fks.map { case (fk, child, key, parent, pkey) =>
          s"""SELECT '$fk' AS fk, count(*) AS n_rows,
             |  count(CASE WHEN p.k IS NULL THEN 1 END) AS n_orphans
             |FROM $child c
             |LEFT JOIN (SELECT DISTINCT $pkey AS k FROM $parent) p
             |  ON c.$key = p.k""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY fk")
      },
      // The oracle aggregates DIRECTLY; the Spark side merges two
      // partials — hash-match is the mergeability proof.
      "incremental_agg_merge" ->
        """SELECT event_type, count(*) AS n,
          |  sum(CAST(round(value * 100) AS BIGINT))
          |    / CAST(100 AS DOUBLE) AS sum_value
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      // Markov next-event matrix: lead over the per-user sequence
      // (micros + event_id tie-break = deterministic), pair counts,
      // per-source normalization. Window sum(BIGINT) is HUGEINT → cast
      // back; the probability is one BIGINT→DOUBLE division (bit-exact).
      "event_transitions" ->
        """WITH seq AS (
          |  SELECT lower(event_type) AS et,
          |    lead(lower(event_type)) OVER (
          |      PARTITION BY user_id
          |      ORDER BY epoch_ns(ts) // 1000, event_id) AS next_et
          |  FROM events),
          |counts AS (
          |  SELECT et AS src_type, next_et AS dst_type,
          |    CAST(count(*) AS BIGINT) AS n_transitions
          |  FROM seq WHERE next_et IS NOT NULL GROUP BY 1, 2)
          |SELECT src_type, dst_type, n_transitions,
          |  CAST(n_transitions AS DOUBLE) /
          |    CAST(CAST(sum(n_transitions) OVER (PARTITION BY src_type)
          |      AS BIGINT) AS DOUBLE) AS p_transition
          |FROM counts ORDER BY src_type, dst_type""".stripMargin,
      // Strictly-after funnel: each step's first time must follow the
      // user's first completion of the previous step.
      "funnel_conversion" ->
        s"""WITH $FunnelCtes
           |SELECT (SELECT count(*) FROM s1) AS n_viewed,
           |  (SELECT count(*) FROM s2) AS n_carted_after,
           |  (SELECT count(*) FROM s3) AS n_purchased_after""".stripMargin,
      // Drop-off rates over the same strictly-after funnel: exact
      // BIGINT→DOUBLE divisions, zero denominators → NULL (not NaN —
      // engines disagree on NaN hashing, and "no viewers" has no rate).
      "funnel_dropoff" ->
        s"""WITH $FunnelCtes,
           |c AS (SELECT (SELECT count(*) FROM s1) AS n_viewed,
           |  (SELECT count(*) FROM s2) AS n_carted_after,
           |  (SELECT count(*) FROM s3) AS n_purchased_after)
           |SELECT n_viewed, n_carted_after, n_purchased_after,
           |  CASE WHEN n_viewed > 0 THEN
           |    CAST(n_carted_after AS DOUBLE) / CAST(n_viewed AS DOUBLE)
           |  END AS r_view_to_cart,
           |  CASE WHEN n_carted_after > 0 THEN
           |    CAST(n_purchased_after AS DOUBLE) /
           |      CAST(n_carted_after AS DOUBLE)
           |  END AS r_cart_to_purchase,
           |  CASE WHEN n_viewed > 0 THEN
           |    CAST(n_purchased_after AS DOUBLE) / CAST(n_viewed AS DOUBLE)
           |  END AS r_view_to_purchase
           |FROM c""".stripMargin,
      "set_ops" ->
        """WITH oc AS (SELECT DISTINCT o_custkey AS c FROM orders),
          |ec AS (SELECT DISTINCT user_id AS c FROM events)
          |SELECT 'intersect' AS op, count(*) AS n FROM
          |  (SELECT c FROM oc INTERSECT SELECT c FROM ec)
          |UNION ALL
          |SELECT 'except', count(*) FROM
          |  (SELECT c FROM oc EXCEPT SELECT c FROM ec)
          |UNION ALL
          |SELECT 'union_all', count(*) FROM
          |  (SELECT c FROM oc UNION ALL SELECT c FROM ec)
          |ORDER BY op""".stripMargin,
      // approx_quantiles: rows-only (sketch families differ across engines)
      // quantiles_global_exact: the discrete rank-pick is engine-portable;
      // the oracle's global window is fine at oracle SF — the Spark side
      // is the distributed Ranks path.
      "quantiles_global_exact" ->
        """WITH ranked AS (
          |  SELECT o_totalprice AS value,
          |         row_number() OVER (ORDER BY o_totalprice, o_orderkey)
          |           AS pos,
          |         count(*) OVER () AS n
          |  FROM orders)
          |SELECT p, value
          |FROM ranked, (VALUES (50), (90), (99)) AS ps(p)
          |WHERE pos = (n * p + 99) // 100
          |ORDER BY p""".stripMargin
    )
  )
}
