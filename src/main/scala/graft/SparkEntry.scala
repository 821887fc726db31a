package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every module's registry, concatenated. Add modules here as phases land
    * (SURVEY.md §7 build order). */
  private[graft] val registry: Registry =
    operators.RecsRegistry.registry ++
      operators.RelationalRegistry.registry ++
      graph.GraphRegistry.registry ++
      text.TextRegistry.registry ++
      dedup.DedupRegistry.registry ++
      similarity.SimilarityRegistry.registry ++
      streaming.StreamingRegistry.registry ++
      multimodal.MultimodalRegistry.registry ++
      sources.SourcesRegistry.registry ++
      pipeline.CurationRegistry.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * J1+A1+O1 — the reference's entire /recs hot path in one plan
    * (scan → filter → join → agg → top-k). */
  def entry(spark: SparkSession): DataFrame =
    operators.Recs.coOccurrence(spark, "/root/testdata/sf0.001", 1L)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = registry.oracles
}
