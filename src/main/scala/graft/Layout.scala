package graft

import org.apache.spark.sql.DataFrame

/** Materialization that keeps a physical layout VISIBLE to downstream
  * plans.
  *
  * `localCheckpoint(eager = true)` captures the physical plan's
  * outputPartitioning/outputOrdering into the LogicalRDD it leaves
  * behind — but under AQE the physical plan is an AdaptiveSparkPlanExec,
  * which reports Unknown partitioning, so the captured layout is Unknown
  * and every downstream consumer re-shuffles and re-sorts what was
  * already partitioned and sorted. Measured on one rank-propagation
  * round (PlanProbe): 4 exchanges + 2 sorts with the naive checkpoint vs
  * 1 exchange + 1 sort with this one — and the extra exchanges are on
  * the EDGE side, i.e. the 100 TB relation re-shuffling per iteration.
  *
  * A layout checkpoint therefore materializes with AQE disabled for just
  * that job: a static `repartition + sortWithinPartitions` plan needs no
  * runtime re-planning, and the resulting LogicalRDD faithfully reports
  * hashpartitioning + sort order, which is what makes iterative state
  * joins exchange-free on the static side (the local twin of a bucketed
  * warehouse table; asserted in PlanAuditSpec).
  */
object Layout {
  /** Serialized: the conf toggle is session-global, so two concurrent
    * materializations could otherwise restore each other's state
    * mid-flight. Layout checkpoints are rare, coarse-grained events
    * (index/iteration-state builds) — the lock is uncontended in
    * practice and correctness-critical if a caller ever threads. */
  def checkpoint(df: DataFrame): DataFrame = synchronized {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try df.localCheckpoint(true)
    finally spark.conf.set(key, prev)
  }

  /** Mode-aware state checkpoint for gated propagation loops: the
    * co-partitioned path NEEDS the layout visible (the next round's
    * exchange-free sort-merge join hangs on it), but the broadcast-gated
    * path does not — the state ships whole regardless, and executing the
    * round with AQE ON lets the planner broadcast the small summed side
    * of the state-update join instead of sort-merging it (measured
    * faster per round at bench scale). */
  def stateCheckpoint(df: DataFrame, preserveLayout: Boolean): DataFrame =
    if (preserveLayout) checkpoint(df) else df.localCheckpoint(true)
}
