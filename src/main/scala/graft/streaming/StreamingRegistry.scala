package graft.streaming

import graft.Registry

/** Registry + DuckDB oracle twins for the batch twins of the streaming
  * transforms (batch/stream plan equivalence is proven in StreamingSpec;
  * the oracle proves the batch side). Timestamps surface as epoch-micros
  * longs (`epoch_ns // 1000` — lossless here, events carry no sub-µs). */
object StreamingRegistry {

  /** Unrolled min-label components over the behavioral bipartite graph
    * ("U<user>" ↔ "P<product>" from the deduped event edges, rel_type
    * collapsed) — the GraphRegistry.componentsSql pattern over the
    * stream_edge_counts dedup. MATERIALIZED is load-bearing: each round
    * reads the previous one twice. */
  private def storeComponentsSql(rounds: Int): String = {
    val head =
      """WITH be AS (
        |  SELECT DISTINCT user_id,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events
        |  WHERE lower(event_type) IN
        |      ('view','click','add_to_cart','purchase','signup','error')
        |    AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      IS NOT NULL),
        |e0 AS MATERIALIZED (SELECT DISTINCT
        |  'U' || CAST(user_id AS VARCHAR) AS src,
        |  'P' || CAST(k AS VARCHAR) AS dst FROM be),
        |und AS MATERIALIZED (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
        |nodes AS (SELECT DISTINCT src AS id FROM und),
        |c0 AS MATERIALIZED (SELECT id, id AS comp FROM nodes)""".stripMargin
    val iterCtes = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT id, min(comp) AS comp FROM (
         |  SELECT id, comp FROM c${i - 1}
         |  UNION ALL
         |  SELECT u.dst AS id, c.comp FROM und u JOIN c${i - 1} c ON c.id = u.src
         |) GROUP BY id)""".stripMargin
    }
    (head +: iterCtes).mkString(",\n") +
      s"""\nSELECT size, count(*) AS n_components FROM (
         |  SELECT comp, count(*) AS size FROM c$rounds GROUP BY comp
         |) GROUP BY size ORDER BY size""".stripMargin
  }

  val registry: Registry = Registry(
    queries = Map(
      "stream_window_counts" -> ((s, d) =>
        EventStreams.windowedCountsBatch(s, d)),
      "stream_sliding_counts" -> ((s, d) =>
        EventStreams.slidingCountsBatch(s, d)),
      "stream_edge_counts" -> ((s, d) => EventStreams.edgeCounts(s, d)),
      "stream_sessions" -> ((s, d) => EventStreams.sessionsBatch(s, d)),
      "stream_view_to_purchase" -> ((s, d) =>
        EventStreams.viewToPurchaseBatch(s, d)),
      "stream_window_topk" -> ((s, d) =>
        EventStreams.windowTopProductsBatch(s, d)),
      "stream_transitions" -> ((s, d) =>
        EventStreams.transitionCountsBatch(s, d)),
      // The streaming→graph loop closed: components over a committed
      // generation of the stream-maintained edge store. The store is
      // built by the REAL readStream→foreachBatch machinery
      // (Trigger.AvailableNow, checkpointed), then read back via
      // edgeStoreAt — the oracle computes the same bounded-round
      // min-label components from the batch dedup of the events table,
      // equal by the stream≡batch convergence identity.
      "store_components_at" -> ((s, d) =>
        EventStreams.storeComponentsAt(s, d)),
      // Time travel as a first-class query: per-type counts of edges NEW
      // between two committed generations (batch-backfill two-gen store;
      // the oracle predicts the same diff from the event halves).
      "store_generation_diff" -> ((s, d) =>
        EventStreams.storeGenerationDiff(s, d)),
      // OPTIMIZE as a first-class row: compact the live partitions and
      // verify row-set identity (the compaction contract) + one file
      // per partition against the oracle's prediction.
      "store_compaction_report" -> ((s, d) =>
        EventStreams.storeCompactionReport(s, d))
    ),
    oracles = Map(
      "stream_window_counts" ->
        """SELECT epoch_ns(date_trunc('hour', ts)) // 1000 AS window_start_us,
          |  event_type, count(*) AS n
          |FROM events GROUP BY 1, 2
          |ORDER BY window_start_us, event_type""".stripMargin,
      "stream_sliding_counts" ->
        """WITH b AS (
          |  SELECT event_type,
          |    epoch_ns(date_trunc('hour', ts)) // 1000
          |      + CASE WHEN epoch_ns(ts) // 1000
          |               - epoch_ns(date_trunc('hour', ts)) // 1000
          |               >= 1800000000 THEN 1800000000 ELSE 0 END
          |      AS aligned_us
          |  FROM events),
          |w AS (
          |  SELECT event_type, aligned_us AS window_start_us FROM b
          |  UNION ALL
          |  SELECT event_type, aligned_us - 1800000000 FROM b)
          |SELECT window_start_us, event_type, count(*) AS n
          |FROM w GROUP BY 1, 2
          |ORDER BY window_start_us, event_type""".stripMargin,
      "stream_window_topk" ->
        """WITH c AS (
          |  SELECT epoch_ns(date_trunc('hour', ts)) // 1000 AS window_start_us,
          |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS product_id,
          |    count(*) AS n
          |  FROM events
          |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
          |  GROUP BY 1, 2)
          |SELECT window_start_us,
          |  CAST(row_number() OVER (PARTITION BY window_start_us
          |    ORDER BY n DESC, product_id) AS BIGINT) AS rk,
          |  product_id, n
          |FROM c QUALIFY rk <= 3
          |ORDER BY window_start_us, rk""".stripMargin,
      // Pair counts of the stateful transition extractor's batch twin —
      // the event_transitions derivation minus the serving-side
      // probability normalization.
      "stream_transitions" ->
        """WITH seq AS (
          |  SELECT lower(event_type) AS et,
          |    lead(lower(event_type)) OVER (
          |      PARTITION BY user_id
          |      ORDER BY epoch_ns(ts) // 1000, event_id) AS next_et
          |  FROM events)
          |SELECT et AS src_type, next_et AS dst_type,
          |  CAST(count(*) AS BIGINT) AS n_transitions
          |FROM seq WHERE next_et IS NOT NULL GROUP BY 1, 2
          |ORDER BY src_type, dst_type""".stripMargin,
      "stream_edge_counts" ->
        """WITH e AS (
          |  SELECT user_id,
          |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |    CASE lower(event_type)
          |      WHEN 'view' THEN 'VIEWED' WHEN 'click' THEN 'CLICKED'
          |      WHEN 'add_to_cart' THEN 'ADDED_TO_CART'
          |      WHEN 'purchase' THEN 'PURCHASED' WHEN 'signup' THEN 'SIGNED_UP'
          |      WHEN 'error' THEN 'ERRORED' END AS rel_type
          |  FROM events
          |  WHERE lower(event_type) IN
          |    ('view','click','add_to_cart','purchase','signup','error'))
          |SELECT rel_type, count(*) AS n FROM (
          |  SELECT DISTINCT user_id, k, rel_type FROM e WHERE k IS NOT NULL)
          |GROUP BY rel_type ORDER BY rel_type""".stripMargin,
      "stream_view_to_purchase" ->
        """WITH e AS (SELECT user_id, lower(event_type) AS et,
          |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |    epoch_ns(ts) // 1000 AS ts_us
          |  FROM events
          |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
          |v AS (SELECT user_id, k, ts_us FROM e WHERE et = 'view'),
          |p AS (SELECT user_id, k, ts_us FROM e WHERE et = 'purchase')
          |SELECT p.k AS product_id, count(*) AS n_attributed
          |FROM v JOIN p ON v.user_id = p.user_id AND v.k = p.k
          |  AND p.ts_us >= v.ts_us AND p.ts_us <= v.ts_us + 86400000000
          |GROUP BY p.k
          |ORDER BY product_id""".stripMargin,
      "store_components_at" ->
        storeComponentsSql(EventStreams.StoreComponentsRounds),
      // Same dedup CTE as stream_edge_counts; the cutpoint is exact long
      // arithmetic (min + (max-min)//2 over epoch micros) mirroring the
      // Scala `div`, and "new in gen 2" = deduped edges of the full set
      // anti-joined against the first half's deduped edges.
      "store_generation_diff" ->
        """WITH raw AS (
          |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
          |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |    CASE lower(event_type)
          |      WHEN 'view' THEN 'VIEWED' WHEN 'click' THEN 'CLICKED'
          |      WHEN 'add_to_cart' THEN 'ADDED_TO_CART'
          |      WHEN 'purchase' THEN 'PURCHASED' WHEN 'signup' THEN 'SIGNED_UP'
          |      WHEN 'error' THEN 'ERRORED' END AS rel_type
          |  FROM events),
          |cutp AS (SELECT min(ts_us) + ((max(ts_us) - min(ts_us)) // 2)
          |    AS cut
          |  FROM (SELECT epoch_ns(ts) // 1000 AS ts_us FROM events)),
          |e AS (SELECT user_id, k, rel_type, ts_us FROM raw
          |  WHERE rel_type IS NOT NULL AND k IS NOT NULL),
          |firsthalf AS (SELECT DISTINCT user_id, k, rel_type
          |  FROM e, cutp WHERE ts_us < cut),
          |full_set AS (SELECT DISTINCT user_id, k, rel_type FROM e)
          |SELECT rel_type, count(*) AS n_new
          |FROM full_set f
          |WHERE NOT EXISTS (SELECT 1 FROM firsthalf h
          |  WHERE h.user_id = f.user_id AND h.k = f.k
          |    AND h.rel_type = f.rel_type)
          |GROUP BY rel_type ORDER BY rel_type""".stripMargin,
      "store_compaction_report" ->
        """WITH e AS (
          |  SELECT user_id,
          |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |    CASE lower(event_type)
          |      WHEN 'view' THEN 'VIEWED' WHEN 'click' THEN 'CLICKED'
          |      WHEN 'add_to_cart' THEN 'ADDED_TO_CART'
          |      WHEN 'purchase' THEN 'PURCHASED' WHEN 'signup' THEN 'SIGNED_UP'
          |      WHEN 'error' THEN 'ERRORED' END AS rel_type
          |  FROM events
          |  WHERE lower(event_type) IN
          |    ('view','click','add_to_cart','purchase','signup','error'))
          |SELECT rel_type, count(*) AS n, CAST(1 AS INT) AS n_files FROM (
          |  SELECT DISTINCT user_id, k, rel_type FROM e WHERE k IS NOT NULL)
          |GROUP BY rel_type ORDER BY rel_type""".stripMargin,
      "stream_sessions" ->
        """WITH t AS (
          |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
          |  FROM events),
          |lagged AS (
          |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
          |    ORDER BY ts_us, event_id) AS prev_us FROM t),
          |flagged AS (
          |  SELECT *, CASE WHEN prev_us IS NULL
          |      OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
          |  FROM lagged),
          |numbered AS (
          |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
          |    ORDER BY ts_us, event_id
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
          |  FROM flagged)
          |SELECT user_id, sess_no, min(ts_us) AS session_start_us,
          |  max(ts_us) AS session_end_us, count(*) AS n_events
          |FROM numbered GROUP BY user_id, sess_no
          |ORDER BY user_id, sess_no""".stripMargin
    )
  )
}
