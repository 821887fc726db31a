package graft

import org.apache.spark.sql.SparkSession

/** Dev main: execute Dedup.thresholdSweep on a given sf dir and print
  * the executed plan with runtime metrics (shuffle bytes written and
  * spill per node) — the audit surface for the sweep's scale shape
  * (which exchange carries corpus-sized data, which sorts spill). */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = dedup.Dedup.thresholdSweep(spark, dir)
    df.collect().foreach(println)
    println(f"elapsed ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def walk(p: org.apache.spark.sql.execution.SparkPlan,
             depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.contains("spill") || k.contains("shuffleBytes") ||
          k.contains("dataSize") || k == "numOutputRows") && m.value > 0
      }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println(("  " * depth) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
