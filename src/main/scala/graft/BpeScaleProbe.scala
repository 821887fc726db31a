package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the BPE tier: training is claimed VOCABULARY-bounded
  * (the only corpus-sized pass is the word-freq groupBy), encoding
  * corpus-bounded. Prints both walls for a dir so the claim is a
  * measured table, not scaladoc.
  *
  * Usage: tools/run.sh graft.BpeScaleProbe <sfDir>
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // Warm the JVM/codegen path untimed on a tiny dir so the measured
    // train wall is the operator, not first-query startup.
    text.BpeTrainer.trainMerges(spark, "/root/testdata/sf0.001").count()
    val (_, tTrain) = timed(text.BpeTrainer.trainMerges(spark, sfDir).count())
    val (nDocs, tEncode) =
      timed(text.BpeTrainer.encodeCounts(spark, sfDir).count())
    println(
      s"""{"probe":"bpe_scale","sf_dir":"$sfDir",""" +
      s""""train_sec":${f"$tTrain%.2f"},""" +
      s""""encode_rows":$nDocs,"encode_sec":${f"$tEncode%.2f"}}""")
    spark.stop()
  }
}
