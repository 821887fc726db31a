package graft.sources

import graft.Registry

/** Registry + oracle for the source-format tier. The oracle aggregates
  * the parquet original once and expects BOTH text formats to reproduce
  * it exactly — a format that drops precision or rows hash-fails. */
object SourcesRegistry {
  val registry: Registry = Registry(
    queries = Map(
      "source_roundtrip_counts" -> ((s, d) => Formats.roundTripCounts(s, d)),
      "source_jdbc_counts" -> ((s, d) => Jdbc.ordersJdbcCounts(s, d)),
      "source_jdbc_lookup" -> ((s, d) => Jdbc.ordersJdbcLookup(s, d)),
      "source_jsonl_tolerant" -> ((s, d) => Formats.tolerantJsonlCounts(s, d)),
      "source_schema_drift" -> ((s, d) => Formats.schemaDriftReport(s, d)),
      // Z-order layout tier: the box query THROUGH the pruned layout
      // (answer ≡ plain scan — the layout must be invisible), and the
      // pruning accounting itself hash-pinned against an oracle that
      // recomputes bin → interleave → clamp from the raw table.
      "layout_zorder_scan" -> ((s, d) => ZOrderLayout.zScan(s, d)),
      "layout_zorder_report" -> ((s, d) => ZOrderLayout.zReport(s, d)),
      // Manifest form (G=8, zbin as a data column, per-file min/max
      // manifest, closed-form z-range decomposition): same plain-scan
      // oracle — manifest pruning must be answer-invisible.
      "layout_zorder_manifest" -> ((s, d) => ZOrderLayout.zScanManifest(s, d))
    ),
    oracles = Map(
      "source_roundtrip_counts" ->
        """WITH a AS (SELECT event_type, count(*) AS n,
          |  sum(CAST(round(value * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
          |    AS sum_value
          |FROM events GROUP BY event_type)
          |SELECT * FROM (
          |  SELECT 'csv' AS fmt, event_type, n, sum_value FROM a
          |  UNION ALL
          |  SELECT 'jsonl', event_type, n, sum_value FROM a
          |) ORDER BY fmt, event_type""".stripMargin,
      // The JDBC read must reproduce the parquet original exactly: same
      // aggregate, computed by DuckDB over the parquet orders table.
      "source_jdbc_counts" ->
        """SELECT o_orderstatus, count(*) AS n,
          |  count(DISTINCT o_custkey) AS n_cust,
          |  sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |    / CAST(100 AS DOUBLE) AS sum_value
          |FROM orders GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin,
      "source_jdbc_lookup" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus,
          |  CAST(round(o_totalprice * 100) AS BIGINT)
          |    / CAST(100 AS DOUBLE) AS o_totalprice
          |FROM orders WHERE o_orderkey = 1""".stripMargin,
      // The oracle never reads the corrupted file: it predicts the same
      // accounting from the corruption rule (every 97th event_id) over
      // the parquet original.
      "source_jsonl_tolerant" ->
        """SELECT count(*) AS n_total,
          |  count(CASE WHEN event_id % 97 = 0 THEN 1 END) AS n_corrupt,
          |  count(CASE WHEN event_id % 97 <> 0 THEN 1 END) AS n_good,
          |  sum(CASE WHEN event_id % 97 <> 0
          |      THEN CAST(round(value * 100) AS BIGINT) END)
          |    / CAST(100 AS DOUBLE) AS sum_value_good
          |FROM events""".stripMargin,
      // The oracle never reads the drifted files: it predicts the
      // declared posture's accounting (null-fill of the dropped column,
      // exact value survival of the widened one) from the slicing rule
      // over the parquet original. File-class counts are the layout's
      // coalesce(1) constants.
      "source_schema_drift" ->
        """SELECT CAST(1 AS BIGINT) AS n_files_conforming,
          |  CAST(1 AS BIGINT) AS n_files_missing_col,
          |  CAST(1 AS BIGINT) AS n_files_type_drift,
          |  count(*) AS n_rows,
          |  count(CASE WHEN o_orderkey % 3 = 1 THEN 1 END)
          |    AS n_null_filled,
          |  CAST(sum(CASE WHEN o_orderkey % 3 = 2 THEN o_custkey % 1000000
          |      ELSE o_custkey END) AS BIGINT) AS sum_custkey,
          |  sum(CASE WHEN o_orderkey % 3 <> 1
          |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
          |    / CAST(100 AS DOUBLE) AS sum_price_present
          |FROM orders""".stripMargin,
      "layout_zorder_scan" -> ZOrderLayout.scanOracleSql,
      "layout_zorder_report" -> ZOrderLayout.reportOracleSql,
      "layout_zorder_manifest" -> ZOrderLayout.scanOracleSql
    )
  )
}
