package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for representative queries
  * so scan pruning (PushedFilters/ReadSchema), broadcast choices, and
  * TakeOrderedAndProject shapes can be audited per change. Not part of the
  * driver contract. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("point_lookup", "rec_cooccurrence", "topk_orders",
        "q1_pricing_summary", "rec_customer", "dedup_ngram_jaccard",
        "scan_project")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
