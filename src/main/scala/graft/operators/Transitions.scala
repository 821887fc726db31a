package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** First-order Markov transition matrix over the event log — the
  * session-modeling primitive behind next-event prediction, funnel
  * discovery, and anomalous-flow detection: for each user's
  * time-ordered event sequence, count (event_type → next event_type)
  * pairs and normalize per source into transition probabilities.
  *
  * Scale shape: ONE window (lead over user_id — the per-user sequence
  * is the natural partition; no global sort) feeding ONE partial-agg
  * count shuffle on the (src, dst) pair; the per-source normalization
  * runs over the counts matrix, which is |event_types|² — a handful of
  * rows at any corpus size, so its window is free. Event times are
  * epoch-micros longs with event_id tie-breaks, making the sequence —
  * and therefore every count — deterministic and exactly
  * oracle-checkable; the probability is a single BIGINT→DOUBLE division
  * per row (bit-exact across engines).
  */
object Transitions {

  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    eventTransitionsOf(Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        lower(col("event_type")).as("et"),
        unix_micros(col("ts")).as("ts_us")))

  /** Core over a pre-projected (user_id, event_id, et, ts_us) frame. */
  def eventTransitionsOf(ev: DataFrame): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val counts = ev
      .withColumn("next_et", lead("et", 1).over(seq))
      .filter(col("next_et").isNotNull)
      .groupBy(col("et").as("src_type"), col("next_et").as("dst_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val perSrc = Window.partitionBy("src_type")
    counts
      .withColumn("p_transition", col("n_transitions").cast("double") /
        sum("n_transitions").over(perSrc).cast("double"))
      .orderBy("src_type", "dst_type")
  }
}
