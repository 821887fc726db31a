package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: decompose the fixed-iteration PageRank round cost. Times
  * each propagation round of the shared 3-column rank loop, then bounds
  * the sorted-fold's share by re-running the same loop with a plain
  * `sum()` (parity-breaking — diagnostic only, never a query path).
  * Usage: tools/run.sh graft.RankProbe [sfDir] [iters] */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graph.GraphAlgs.prewarm(spark, dir)
    val coPart = graph.GraphAlgs.stateCoPartitioned(spark, dir)
    val e = graph.GraphAlgs.rankEdges(spark, dir, bySrc = coPart)
    val nodes = graph.GraphAlgs.nodesById(spark, dir)
    println(s"[probe] coPart=$coPart |V|=${nodes.count()} |E|=${e.count()}")

    val seeds = graph.GraphAlgs.SharedRankSeeds
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // queries-only mode: what Bench sees — prewarm, then straight to
    // the measured queries with no extra loop executions in between.
    if (args.contains("queries-only")) {
      for (q <- Seq("pagerank_fixed_top", "components_fixed_sizes",
          "weighted_pagerank_top", "graph_clustering_top"))
        timed(s"query $q") {
          SparkEntry.queries(q)(spark, dir).count()
        }
      spark.stop(); return
    }

    def loop(tag: String, step: DataFrame => DataFrame): Unit = {
      val inits = seeds.zipWithIndex.map {
        case (None, j) => lit(1.0).as(s"r$j")
        case (Some(s), j) =>
          when(col("id") === s, lit(1.0)).otherwise(lit(0.0)).as(s"r$j")
      }
      var ranks = nodes.select(col("id") +: inits: _*)
      timed(s"$tag TOTAL") {
        for (i <- 1 to iters)
          ranks = timed(s"$tag round$i") {
            Layout.stateCheckpoint(step(ranks), preserveLayout = coPart)
          }
      }
    }

    // A: the production round.
    loop("prod", r =>
      graph.GraphAlgs.rankStep(e, nodes, r, seeds, coPart))

    // B: identical join shape, plain sum() fold (bounds the sorted
    // fold's share; parity-breaking, diagnostic only).
    loop("plainsum", { r =>
      val state = r.withColumnRenamed("id", "src")
      val contribs = e
        .join(if (coPart) state.hint("merge") else broadcast(state), "src")
        .select(col("dst").as("id") +: seeds.indices.map(j =>
          (col(s"r$j") / col("outdeg")).as(s"c$j")): _*)
      val sums = seeds.indices.map(j => sum(col(s"c$j")).as(s"in$j"))
      val summed = contribs.groupBy("id").agg(sums.head, sums.tail: _*)
      val updates = seeds.zipWithIndex.map { case (sd, j) =>
        val reset = sd match {
          case None => lit(0.15)
          case Some(s) => when(col("id") === s, lit(0.15)).otherwise(lit(0.0))
        }
        (reset + lit(0.85) * coalesce(col(s"in$j"), lit(0.0))).as(s"r$j")
      }
      nodes.join(summed, Seq("id"), "left")
        .select(col("id") +: updates: _*)
    })

    // C: production round, checkpoint only every K rounds (lazy
    // segments in between; the final count stands in for the consumer).
    def segmented(k: Int): Unit = {
      val inits = seeds.zipWithIndex.map {
        case (None, j) => lit(1.0).as(s"r$j")
        case (Some(s), j) =>
          when(col("id") === s, lit(1.0)).otherwise(lit(0.0)).as(s"r$j")
      }
      var ranks = nodes.select(col("id") +: inits: _*)
      timed(s"seg$k TOTAL") {
        for (i <- 1 to iters) {
          ranks = graph.GraphAlgs.rankStep(e, nodes, ranks, seeds, coPart)
          if (i % k == 0 || i == iters)
            ranks = Layout.stateCheckpoint(ranks, preserveLayout = coPart)
        }
        ranks.count()
      }
    }
    segmented(4)
    segmented(3)
    segmented(2)

    // D: the exact benched queries, first touch after prewarm (what
    // Bench measures mid-run), on a fresh memo-keyed session clone.
    for (q <- Seq("pagerank_fixed_top", "ppr_fixed_top",
        "weighted_pagerank_top", "components_fixed_sizes"))
      timed(s"query $q") {
        SparkEntry.queries(q)(spark, dir).count()
      }
    spark.stop()
  }
}
