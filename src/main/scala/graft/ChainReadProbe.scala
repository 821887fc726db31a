package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-side cost of the edge store's delta chains (VERDICT r11 item 4):
  * the O(batch) delta-append commit bought its write-amp win by making
  * SERVING reads resolve a union + dropDuplicates over up to
  * [[graft.streaming.EventStreams.DeltaChainCap]] dirs per partition —
  * `store_generation_diff` picked up ~2× wall and a 0.5 MB shuffle from
  * exactly that. This probe puts numbers on the read tax so the cap
  * default is justified by data on the read side the way the write side
  * already is (SCALING.md): it builds one store per chain length
  * (1, cap/2, cap) through the REAL mergeEdgeBatch path — time-sliced
  * merges so every batch touches every partition — then times the two
  * serving shapes a store actually pays:
  *   - snapshot_read: full live-snapshot scan (edgeStore → count)
  *   - gen_diff: the two-snapshot anti-join of storeGenerationDiff
  *     (read gen N−1 and N through their manifests, anti-join, count)
  *
  * Usage: tools/run.sh graft.ChainReadProbe <sfDir>
  * Honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS; prints one
  * JSON line per chain length plus a summary line.
  */
object ChainReadProbe {

  private def fileCount(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) 1L
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

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

    val cap = streaming.EventStreams.DeltaChainCap
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (mn, mx) = {
      val r = ev.agg(min("ts_us"), max("ts_us")).head()
      (r.getLong(0), r.getLong(1))
    }

    // chainLen 1 is produced by cap=1 (every merge folds — the old
    // rewrite-per-merge behavior); longer chains by N time-sliced merges
    // under the default cap. Two merges minimum so gen_diff has a
    // previous snapshot to read.
    val cases = Seq(1, math.max(2, cap / 2), cap)
    val results = cases.map { chainLen =>
      val nMerges = math.max(2, chainLen)
      if (chainLen == 1) sys.props("spark.graft.store.deltaChainCap") = "1"
      else sys.props.remove("spark.graft.store.deltaChainCap")
      try {
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$sfDir#chain$chainLen".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
        val store = Scratch.dir("graft-chainprobe", tag) + "/store"
        val (_, tBuild) = timed {
          for (i <- 0 until nMerges) {
            val lo = mn + (mx - mn + 1) * i / nMerges
            val hi = mn + (mx - mn + 1) * (i + 1) / nMerges
            streaming.EventStreams.mergeEdgeBatch(
              streaming.EventStreams.dedupedBehavioralEdges(
                ev.filter(col("ts_us") >= lo && col("ts_us") < hi)), store)
          }
        }
        val gens = streaming.EventStreams.committedGenerations(store)
        val man = streaming.EventStreams.manifest(store)
        val maxChain = man.values.map(_.length).max
        val (nEdges, tRead) = timed {
          streaming.EventStreams.edgeStore(spark, store).count()
        }
        val (nNew, tDiff) = timed {
          val before = streaming.EventStreams
            .edgeStoreAt(spark, store, gens(gens.length - 2))
          val after = streaming.EventStreams
            .edgeStoreAt(spark, store, gens.last)
          after.join(before, Seq("user_id", "product_id", "rel_type"),
              "left_anti")
            .groupBy("rel_type").agg(count(lit(1)).as("n_new"))
            .collect().map(_.getLong(1)).sum
        }
        val line =
          s"""{"probe":"chain_read","sf_dir":"$sfDir","cap":$cap,""" +
          s""""chain_len":$maxChain,"n_merges":$nMerges,""" +
          s""""build_sec":${f"$tBuild%.2f"},"n_edges":$nEdges,""" +
          s""""store_files":${fileCount(store)},""" +
          s""""snapshot_read_sec":${f"$tRead%.2f"},""" +
          s""""gen_diff_sec":${f"$tDiff%.2f"},"gen_diff_new":$nNew}"""
        println(line)
        (maxChain, nEdges, tRead, tDiff)
      } finally {
        sys.props.remove("spark.graft.store.deltaChainCap"); ()
      }
    }
    // All chain lengths must read the SAME edge set — a probe whose
    // variants disagree is measuring different work.
    require(results.map(_._2).distinct.length == 1,
      s"edge counts diverged across chain lengths: ${results.map(_._2)}")

    // Auto-compaction policy arm (r13): the same cap-length merge
    // sequence with the maintainEdgeStore policy active — fold whenever
    // a chain passes the read budget. The serving read must land in the
    // compacted cost class and the final chain within budget: the probe
    // row behind "the chain tax is bounded by policy".
    {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$sfDir#autocompact".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val store = Scratch.dir("graft-chainprobe", tag) + "/store"
      val nMerges = math.max(2, cap)
      val budget = streaming.EventStreams.AutoCompactMaxChain
      var nCompactions = 0
      val (_, tBuild) = timed {
        for (i <- 0 until nMerges) {
          val lo = mn + (mx - mn + 1) * i / nMerges
          val hi = mn + (mx - mn + 1) * (i + 1) / nMerges
          streaming.EventStreams.mergeEdgeBatch(
            streaming.EventStreams.dedupedBehavioralEdges(
              ev.filter(col("ts_us") >= lo && col("ts_us") < hi)), store)
          if (streaming.EventStreams.maybeCompactEdgeStore(spark, store))
            nCompactions += 1
        }
      }
      val maxChain = streaming.EventStreams.manifest(store)
        .values.map(_.length).max
      val (nEdges, tRead) = timed {
        streaming.EventStreams.edgeStore(spark, store).count()
      }
      require(nEdges == results.head._2,
        s"auto-compacted store diverged: $nEdges vs ${results.head._2}")
      require(maxChain <= budget,
        s"policy failed to bound the chain: $maxChain > $budget")
      println(
        s"""{"probe":"chain_read_autocompact","sf_dir":"$sfDir",""" +
        s""""n_merges":$nMerges,"budget":$budget,""" +
        s""""compactions":$nCompactions,"final_chain":$maxChain,""" +
        s""""build_sec":${f"$tBuild%.2f"},""" +
        s""""snapshot_read_sec":${f"$tRead%.2f"},"n_edges":$nEdges}""")
    }
    spark.stop()
  }
}
