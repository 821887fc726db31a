package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL twins.
  * Each module contributes one; SparkEntry concatenates them.
  * Queries with no SQL-expressible oracle appear only in `queries`
  * (the driver then records a weaker rows-only check).
  */
case class Registry(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String]) {
  def ++(other: Registry): Registry =
    Registry(queries ++ other.queries, oracles ++ other.oracles)
}

object Registry {
  val empty: Registry = Registry(Map.empty, Map.empty)
}
