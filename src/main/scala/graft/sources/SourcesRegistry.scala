package graft.sources

import graft.Registry

/** Registry + oracle for the source-format tier. The oracle aggregates
  * the parquet original once and expects BOTH text formats to reproduce
  * it exactly — a format that drops precision or rows hash-fails. */
object SourcesRegistry {
  val registry: Registry = Registry(
    queries = Map(
      "source_roundtrip_counts" -> ((s, d) => Formats.roundTripCounts(s, d))
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
          |) ORDER BY fmt, event_type""".stripMargin
    )
  )
}
