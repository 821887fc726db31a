package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev main: compare Ranks.withGlobalPos positions against the
  * reference single-partition row_number on the RFM base — the probe
  * that caught the r7 double-sampled-range-exchange regression (a
  * separately-planned offsets branch drew different range bounds than
  * the row branch and shifted positions at partition boundaries).
  * Expect "mismatches: 0" on every run.
  * Usage: SPARK_GRAFT_CPUS=4 tools/run.sh graft.RanksConsistencyProbe [sfDir] */
object RanksConsistencyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = Tables.load(spark, dir, "orders")
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("anchor"))
    val base = o.groupBy(col("o_custkey").as("custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("f"),
        sum(operators.Relational.cents(col("o_totalprice"))).as("m_cents"))
      .crossJoin(broadcast(anchor))
      .select(col("custkey"),
        datediff(col("anchor"), col("last_order")).as("r_days"),
        col("f"), col("m_cents"))

    // chained like rfmFeatures
    val ranked = Seq(
      (Seq(col("r_days").asc, col("custkey").asc), "__pr"),
      (Seq(col("f").desc, col("custkey").asc), "__pf"),
      (Seq(col("m_cents").desc, col("custkey").asc), "__pm"))
      .foldLeft(base) { case (df, (keys, pos)) =>
        operators.Ranks.withGlobalPos(df, keys, pos)
      }

    val ref = base
      .withColumn("ref_pr", row_number().over(
        Window.orderBy(col("r_days").asc, col("custkey").asc)))
      .withColumn("ref_pf", row_number().over(
        Window.orderBy(col("f").desc, col("custkey").asc)))
      .withColumn("ref_pm", row_number().over(
        Window.orderBy(col("m_cents").desc, col("custkey").asc)))
      .select("custkey", "ref_pr", "ref_pf", "ref_pm")

    val j = ranked.join(ref, "custkey")
      .select(col("custkey"),
        col("__pr"), col("ref_pr"),
        col("__pf"), col("ref_pf"),
        col("__pm"), col("ref_pm"))
    val bad = j.filter(col("__pr") =!= col("ref_pr") ||
      col("__pf") =!= col("ref_pf") || col("__pm") =!= col("ref_pm"))
    println(s"[debug] mismatches: ${bad.count()} of ${j.count()}")
    bad.orderBy("custkey").show(20, false)
    spark.stop()
  }
}
