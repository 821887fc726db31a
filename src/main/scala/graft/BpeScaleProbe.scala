package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the BPE tier: training is claimed VOCABULARY-bounded
  * (the only corpus-sized pass is the word-freq groupBy) AND — since the
  * batched rounds of r13 — sub-linear in K (rounds ≈ K/BatchM when the
  * corpus cooperates). Prints a K-SWEEP of train walls plus the encode
  * wall so both claims are a measured table, not scaladoc.
  *
  * Usage: tools/run.sh graft.BpeScaleProbe <sfDir> [k1 k2 ...]
  *        (default sweep: 8 64 256)
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks: Seq[Int] =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(8, 64, 256)
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
    // target (never a hardcoded dir — the r12 probe-warmup advice).
    val warm = Tables.load(spark, sfDir, "documents").limit(256)
    text.BpeTrainer.trainedK(spark, warm, ("bpe-probe-warm", sfDir), 4)
    val docs = Tables.load(spark, sfDir, "documents")
    val sweep = ks.map { k =>
      val ((merges, _), t) = timed(
        text.BpeTrainer.trainedK(spark, docs, ("bpe-probe", sfDir, k), k))
      val n = merges.count()
      s""""k$k":{"train_sec":${f"$t%.2f"},"merges":$n,""" +
        s""""rounds":${text.BpeTrainer.lastRounds}}"""
    }
    val (nDocs, tEncode) =
      timed(text.BpeTrainer.encodeCounts(spark, sfDir).count())
    // The testdata corpus has a ~61-word vocabulary that fully merges at
    // ~126 rules — it cannot HOLD K=256. The deep-K capability claim
    // needs a corpus with real lexical diversity: 40k docs of md5-hex
    // words (16-char alphabet, 32-char words — merge structure for
    // thousands of rules). Rounds << merges is the bounded-rounds proof.
    import org.apache.spark.sql.functions._
    val synth = spark.range(40000L).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        md5(concat(lit("a"), col("id"))),
        md5(concat(lit("b"), col("id") % 1000)),
        md5(concat(lit("c"), col("id") % 100)),
        md5(concat(lit("d"), col("id") % 10))).as("text"))
    val deepSweep = Seq(256, 512).map { k =>
      val ((merges, _), t) = timed(
        text.BpeTrainer.trainedK(spark, synth, ("bpe-probe-synth", k), k))
      val n = merges.count()
      s""""synth_k$k":{"train_sec":${f"$t%.2f"},"merges":$n,""" +
        s""""rounds":${text.BpeTrainer.lastRounds}}"""
    }
    println(
      s"""{"probe":"bpe_scale","sf_dir":"$sfDir",${sweep.mkString(",")},""" +
      s"""${deepSweep.mkString(",")},""" +
      s""""encode_rows":$nDocs,"encode_sec":${f"$tEncode%.2f"}}""")
    spark.stop()
  }
}
