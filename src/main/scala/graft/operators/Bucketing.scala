package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-layout co-located joins — the storage-side half of the 100 TB
  * posture: persist the fact table bucketed (and sorted) by its join key
  * so every subsequent equi-join on that key is shuffle-free (sort-merge
  * over pre-sorted buckets, no Exchange on either side).
  *
  * On a cluster this is the difference between re-shuffling N TB per join
  * and reading co-located buckets; BucketingSpec asserts the Exchange
  * nodes are actually absent from the physical plan.
  */
object Bucketing {

  /** Persist lineitem bucketed+sorted by l_orderkey as a managed table. */
  def writeBucketedLineitem(spark: SparkSession, dir: String,
                            table: String, buckets: Int = 8): Unit = {
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable(table)
  }

  /** Self-join on the bucket key (the all-pairs co-occurrence shape):
    * with bucketing this plans as a shuffle-free sort-merge join. */
  def bucketedSelfJoin(spark: SparkSession, table: String): DataFrame = {
    val t = spark.table(table)
    t.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(t.select(col("l_orderkey"), col("l_partkey").as("p2")),
        "l_orderkey")
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n"))
  }
}
