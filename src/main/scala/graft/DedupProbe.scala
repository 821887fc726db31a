package graft

import org.apache.spark.sql.SparkSession

/** Dev main: stage-by-stage wall of the MinHash pipeline's first-pay —
  * which tier (shingles / signatures / buckets / verify / rounds) owns
  * the cost. Usage: tools/run.sh graft.DedupProbe <sfDir> */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("shingle-arrays")(graft.dedup.Dedup.shingleArrays(spark, dir).count())
    t("shingles")(graft.dedup.Dedup.shingles(spark, dir).count())
    t("signatures")(graft.dedup.Dedup.minhashSignatures(spark, dir).count())
    t("cand+verify")(
      graft.dedup.Dedup.minhashCandidateScores(spark, dir).count())
    t("pairs@0.8")(graft.dedup.Dedup.minhashLshPairs(spark, dir).count())
    t("components")(
      graft.dedup.Dedup.minhashClusters(spark, dir).count())
    spark.stop()
  }
}
