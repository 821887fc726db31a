package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Experimentation analytics: an A/B conversion report with a Pearson
  * chi-square statistic over the 2×2 (variant × converted) table.
  *
  * Variant assignment is a deterministic hash of the unit of
  * randomization (`user_id % 2` here — at a real deployment a salted
  * hash bucket; the % keeps both engines bit-identical without sharing a
  * hash implementation). Conversion is "user has ≥1 purchase event".
  * The statistic is computed from EXACT integer aggregates cast to
  * double only at the final formula — each factor individually, so
  * nothing overflows at any unit count (a 10⁹-user experiment's
  * cross-products exceed BIGINT; per-factor doubles do not) and both
  * engines execute the identical IEEE-754 expression tree.
  *
  * The WHOLE computation is one shared SQL text ([[AbSql]]) run by
  * Spark over a temp view and by DuckDB over the parquet table — the
  * sql_api_* discipline: textual parity makes arithmetic drift
  * impossible, not just unlikely.
  *
  * At 100 TB: two aggregations — per-user max (map-side combinable,
  * shuffled by user_id) and a scalar rollup. No windows, no joins,
  * no driver-side state beyond the one output row.
  */
object Experiment {

  /** Conversion = any purchase above this value: the bare "any purchase"
    * event is universal on this data (every user converts → a zero
    * margin and an undefined chi2), so the metric thresholds at ~p95 of
    * purchase values, splitting users 30–50% at every SF. */
  val ConvValue = 150

  /** Shared SQL body; `$table` is the events relation's name. */
  def AbSql(table: String): String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    max(CASE WHEN lower(event_type) = 'purchase'
       |             AND value > $ConvValue THEN 1 ELSE 0 END)
       |      AS conv
       |  FROM $table GROUP BY user_id),
       |s AS (
       |  SELECT
       |    CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv END) AS BIGINT)
       |      AS conv_a,
       |    CAST(count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv END) AS BIGINT)
       |      AS conv_b
       |  FROM u)
       |SELECT n_a, conv_a, n_b, conv_b,
       |  CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
       |  CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
       |  CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
       |         OR (n_a - conv_a) + (n_b - conv_b) = 0 THEN NULL ELSE
       |  (CAST(n_a + n_b AS DOUBLE)
       |    * ((CAST(conv_a AS DOUBLE) * CAST(n_b - conv_b AS DOUBLE)
       |        - CAST(n_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE))
       |       * (CAST(conv_a AS DOUBLE) * CAST(n_b - conv_b AS DOUBLE)
       |          - CAST(n_a - conv_a AS DOUBLE) * CAST(conv_b AS DOUBLE))))
       |  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
       |     * CAST(conv_a + conv_b AS DOUBLE)
       |     * CAST((n_a - conv_a) + (n_b - conv_b) AS DOUBLE)) END AS chi2
       |FROM s""".stripMargin

  def abConversionReport(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .createOrReplaceTempView("graft_ab_events")
    spark.sql(AbSql("graft_ab_events"))
  }
}
