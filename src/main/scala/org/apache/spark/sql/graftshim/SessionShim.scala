package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Private-API shim — lives under `org.apache.spark.sql` for
  * `private[sql]` access to `classic.SparkSession.cloneSession` and
  * `classic.Dataset.ofRows`. Kept to the minimum surface graft.Layout
  * needs; everything else in the repo stays on the public API.
  */
object SessionShim {

  /** Eagerly materialize `df` as a local checkpoint, planned under a
    * CLONE of its session with AQE disabled, and re-bind the resulting
    * LogicalRDD to the original session.
    *
    * Why a clone: a layout checkpoint needs AQE off at planning time
    * (an AdaptiveSparkPlanExec reports Unknown partitioning, so the
    * checkpoint would lose the very layout it exists to pin — see
    * graft.Layout). Toggling `spark.sql.adaptive.enabled` on the
    * caller's session is session-global: any concurrent query planned
    * in that window (e.g. Serve's request pool during a first-touch
    * index build) silently runs without AQE. A cloned session shares
    * the SparkContext and session state but owns its conf, so the
    * toggle is invisible outside this materialization — and no lock is
    * needed.
    *
    * The LogicalRDD a checkpoint leaves behind is session-agnostic
    * (an RDD[InternalRow] + schema + the captured partitioning and
    * ordering), so re-binding it to the caller's session is a pure
    * plan-node transfer — downstream plans compose with it exactly as
    * if the checkpoint had run on the original session.
    */
  def checkpointWithoutAqe(df: DataFrame): DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val cloned = session.cloneSession()
    cloned.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical
    val ck = classic.Dataset.ofRows(cloned, plan).localCheckpoint(true)
    val ckPlan = ck.asInstanceOf[classic.Dataset[Row]].queryExecution.logical
    classic.Dataset.ofRows(session, ckPlan)
  }
}
