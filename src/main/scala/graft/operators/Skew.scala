package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-handling tier: hot keys (one event type dominating the log, one
  * product dominating events) serialize a naive shuffle onto a single
  * reducer at 100 TB. Both standard remedies, expressed so the result is
  * provably identical to the unsalted plan (the DuckDB oracles are the
  * PLAIN formulations — salting must never change an answer):
  *
  *  - salted two-stage aggregation: stage 1 groups on (key, salt) so a
  *    hot key spreads over `Salts` reducers, stage 2 combines the
  *    partials per key;
  *  - salted shuffle join: the skewed fact side gets a deterministic
  *    salt from a unique column, the dimension side is replicated
  *    ×`Salts`, and the join key becomes (key, salt) — a hot join key
  *    now lands on `Salts` reducers. The dim side carries a merge hint:
  *    at toy SF Catalyst would broadcast the dimension (correctly!) and
  *    the salted-shuffle path would never execute; at the scale where
  *    salting matters the dim no longer broadcasts and the optimizer
  *    picks this shape on its own. AQE's skew-join split is the runtime
  *    variant of the same idea; this is the declarative one.
  */
object Skew {

  /** Salt fan-out: a hot key's rows spread over this many reducers. */
  val Salts = 16

  private def salt(unique: org.apache.spark.sql.Column) =
    pmod(hash(unique), lit(Salts))

  /** Event counts per type via salted two-stage aggregation. */
  def saltedEventCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), salt(col("event_id")).as("salt"))
      .agg(count(lit(1)).as("pn"))
      .groupBy("event_type").agg(sum("pn").as("n"))
      .orderBy("event_type")

  /** Brand counts of targeted events via a salted shuffle join. */
  def saltedBrandCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .withColumn("salt", salt(col("event_id")))
    val dim = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(array((0 until Salts).map(lit(_)): _*)))
      .hint("merge")
    ev.join(dim, ev("k") === dim("p_partkey") && ev("salt") === dim("salt"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy("p_brand")
  }
}
