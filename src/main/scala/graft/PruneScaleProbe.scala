package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale probe for the scan-reduction tier: how much does bloom pruning
  * cut the fact exchange, and how many files does the Z-order candidate
  * predicate skip, at a given SF dir — walls plus the noise-immune PLAN
  * properties (exchange bytes, post-pruning file counts).
  *
  * Usage: tools/run.sh graft.PruneScaleProbe <sfDir>
  */
object PruneScaleProbe {
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
    def shuffleBytes(df: DataFrame): Long = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L) +
            e.children.map(walk).sum
        case other => other.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    def filesRead(df: DataFrame): Long = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numFiles").map(_.value).getOrElse(0L)
        case other => other.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }

    // Bloom: build outside both measurements (the sketch is ingest-tier
    // state per the accounting convention), then A/B the same join shape.
    operators.Pruning.dimBloomBytes(spark, sfDir)
    // Warm the fact scan's page cache untimed (whichever side ran first
    // would otherwise pay the cold read), then time FRESH frames — a
    // re-collect of the same Dataset would reuse its materialized AQE
    // stages and measure only the final stage.
    operators.Pruning.bloomPrunedBrandVolume(spark, sfDir).collect()
    operators.Pruning.plainBrandVolume(spark, sfDir).collect()
    val pruned = operators.Pruning.bloomPrunedBrandVolume(spark, sfDir)
    val plain = operators.Pruning.plainBrandVolume(spark, sfDir)
    val (_, tPruned) = timed(pruned.collect())
    val (_, tPlain) = timed(plain.collect())
    val (bPruned, bPlain) = (shuffleBytes(pruned), shuffleBytes(plain))

    // Z-order: layout build outside (ingest-tier write), then the pruned
    // box scan vs the SAME box aggregate over all files (exact predicate,
    // no zbin prune) — the true unpruned comparator; a bare count(*)
    // would be a footer-only read and flatter the full side.
    val (lay, bounds) = sources.ZOrderLayout.layout(spark, sfDir)
    import org.apache.spark.sql.functions._
    def fullBox() = lay
      .filter(col("o_custkey")
        .between(sources.ZOrderLayout.CustLo, sources.ZOrderLayout.CustHi) &&
        expr("unix_micros(cast(o_orderdate as timestamp)) div " +
          s"${sources.ZOrderLayout.DayUs}")
          .between(sources.ZOrderLayout.DayLo, sources.ZOrderLayout.DayHi))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
      .orderBy("o_orderpriority")
    sources.ZOrderLayout.zScan(spark, sfDir).collect()
    fullBox().collect()
    val zPruned = sources.ZOrderLayout.zScan(spark, sfDir)
    val zFull = fullBox()
    val (_, tZPruned) = timed(zPruned.collect())
    val (_, tZFull) = timed(zFull.collect())
    val (fPruned, fFull) = (filesRead(zPruned), filesRead(zFull))
    val nRanges = sources.ZOrderLayout.candidateRanges(bounds).size

    // Manifest form (G=8): layout + manifest build outside (ingest-tier),
    // then the manifest-pruned box scan — file subsets come from driver
    // interval math over the manifest, not directory pruning.
    sources.ZOrderLayout.manifestLayout(spark, sfDir)
    sources.ZOrderLayout.zScanManifest(spark, sfDir).collect()
    val zm = sources.ZOrderLayout.zScanManifest(spark, sfDir)
    val (_, tZm) = timed(zm.collect())
    val (mTotal, mKept, mRanges) =
      sources.ZOrderLayout.manifestPruneStats(spark, sfDir)

    println(
      s"""{"probe":"prune_scale","sf_dir":"$sfDir",""" +
      s""""bloom_pruned_sec":${f"$tPruned%.2f"},""" +
      s""""bloom_plain_sec":${f"$tPlain%.2f"},""" +
      s""""bloom_pruned_shuffle_b":$bPruned,""" +
      s""""bloom_plain_shuffle_b":$bPlain,""" +
      s""""zscan_pruned_sec":${f"$tZPruned%.2f"},""" +
      s""""zscan_full_sec":${f"$tZFull%.2f"},""" +
      s""""z_files_pruned":$fPruned,"z_files_full":$fFull,""" +
      s""""z_ranges":$nRanges,""" +
      s""""zm_sec":${f"$tZm%.2f"},"zm_files_read":$mKept,""" +
      s""""zm_files_total":$mTotal,"zm_ranges":$mRanges}""")
    spark.stop()
  }
}
