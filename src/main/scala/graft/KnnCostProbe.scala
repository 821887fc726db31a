package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost-attribution probe for the batch kNN join's 100× wall time: runs
  * the N^1.5 bulk relation (candidate generation + native cosine) into a
  * plain count/sum aggregate — NO per-cell window, NO sort, NO dedup —
  * then the full knnJoin, and prints both walls. If the bulk alone is
  * most of the total, the operator is compute-bound at its cell-bound
  * theory and no exact top-k machinery can materially cut it; if the gap
  * is large, the downstream sort/top-k is the lever.
  *
  * Usage: tools/run.sh graft.KnnCostProbe <sfDir>
  */
object KnnCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // Index build is prewarm-tier by convention — pay it outside both
    // measurements so the two walls attribute only per-run work.
    val (_, tIndex) = timed {
      similarity.Similarity.knnScored(spark, sfDir, 1).limit(1).count()
    }
    val (bulk, tBulk) = timed {
      similarity.Similarity
        .knnScored(spark, sfDir, similarity.Similarity.KnnJoinNProbe)
        .agg(count(lit(1)).as("n"), sum("cos").as("s")).collect()
    }
    val (full, tFull) = timed {
      similarity.Similarity.knnJoin(spark, sfDir).count()
    }
    println(
      s"""{"probe":"knn_cost","sf_dir":"$sfDir",""" +
      s""""index_prewarm_sec":${f"$tIndex%.1f"},""" +
      s""""bulk_rows":${bulk.head.getLong(0)},""" +
      s""""bulk_sec":${f"$tBulk%.1f"},""" +
      s""""full_rows":$full,"full_sec":${f"$tFull%.1f"}}""")
    spark.stop()
  }
}
