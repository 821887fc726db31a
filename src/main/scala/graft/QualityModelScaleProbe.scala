package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the learned quality model: training is claimed to be
  * ONE corpus-sized scan into a ten-long aggregation (state constant in
  * corpus size), scoring a codegen'd projection over three broadcast
  * literals. Prints the train/score/eval walls for a dir so the claim
  * is a measured table, not scaladoc.
  *
  * Usage: tools/run.sh graft.QualityModelScaleProbe <sfDir>
  */
object QualityModelScaleProbe {
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
    // Warm the JVM/codegen path untimed on a tiny DERIVED sample of the
    // target dir itself (ADVICE r12: a hardcoded warmup dir crashes on
    // hosts without it, and warming on the target dir would memoize the
    // model and make train_sec a ~0 cache hit). A 256-doc limit pays the
    // codegen/scan startup without pre-aggregating the corpus; the timed
    // build below bypasses Memo so it can never read a warm entry.
    val warm = Tables.load(spark, sfDir, "documents").limit(256)
    text.QualityModel.modelOf(
      text.QualityModel.sumsOf(text.QualityModel.featFrameOf(warm)))
    val (m, tTrain) = timed(text.QualityModel.modelOf(
      text.QualityModel.sumsOf(text.QualityModel.featFrameOf(
        Tables.load(spark, sfDir, "documents")))))
    // Populate the memo UNTIMED so score/eval walls measure serving, not
    // a second model build (they read model() internally).
    text.QualityModel.model(spark, sfDir)
    val (nScored, tScore) =
      timed(text.QualityModel.scores(spark, sfDir).count())
    val (_, tEval) =
      timed(text.QualityModel.evalReport(spark, sfDir).count())
    println(
      s"""{"probe":"quality_model_scale","sf_dir":"$sfDir",""" +
      s""""n_docs":${m.sums.n},"train_sec":${f"$tTrain%.2f"},""" +
      s""""score_rows":$nScored,"score_sec":${f"$tScore%.2f"},""" +
      s""""eval_sec":${f"$tEval%.2f"},""" +
      s""""w_intercept":${m.w0},"w_chars":${m.w1},"w_pieces":${m.w2}}""")
    spark.stop()
  }
}
