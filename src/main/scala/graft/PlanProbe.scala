package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: print the executed plan of one rank-propagation round — the
  * audit surface for the exchange-free iteration claim (sort order and
  * partitioning survival through materialization). Tries the layout
  * materialization variants side by side. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = graph.GraphBuilder.edges(spark, dir).select("src", "dst")
    val e0 = raw.join(raw.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")

    def probe(tag: String)(mk: DataFrame => DataFrame): Unit = {
      val e = mk(e0.repartition(4, col("src")).sortWithinPartitions("src"))
      val nodes = mk(graph.GraphBuilder.nodes(spark, dir).select("id")
        .repartition(4, col("id")))
      val init = mk(nodes.select(col("id"), lit(1.0).as("r0")))
      val step = graph.GraphAlgs.rankStep(e, nodes, init, Seq(None),
        coPartition = true)
      step.count()
      val plan = step.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nSort = "\\+- Sort ".r.findAllIn(plan).length
      println(s"=== $tag: exchanges=$nEx sorts=$nSort")
      if (sys.env.contains("PROBE_VERBOSE")) println(plan)
    }

    probe("localCheckpoint, AQE on")(_.localCheckpoint(true))
    probe("localCheckpoint, AQE off during build") { df =>
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try df.localCheckpoint(true)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    probe("persist") { df =>
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    spark.stop()
  }
}
