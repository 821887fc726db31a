package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress driver for the streaming/store tier (the one major tier
  * SCALING.md had no entries for): drives the REAL ingest machinery —
  * file-source micro-batches → watermarked dropDuplicatesWithinWatermark
  * → foreachBatch generation commits — then the maintenance compaction
  * and the store-snapshot components query, and prints ONE JSON line of
  * wall times + state/layout sizes so 10× vs 100× ratios can be read
  * directly.
  *
  * Usage: tools/run.sh graft.StoreScaleProbe <sfDir> [nBatches]
  *
  * The events table is spooled into `nBatches` files first and streamed
  * with maxFilesPerTrigger=1, so the run commits ~nBatches generations —
  * the generation-accretion shape a long-lived incremental store
  * actually has (a single-file slice would drain in one batch and
  * measure nothing about accretion). Honors the scale-run env knobs
  * (SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS).
  */
object StoreScaleProbe {

  private def duBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  private def fileCount(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) 1L
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
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

    // True task-level output bytes (parquet writes), the direct
    // write-amplification measure: ingest_bytes_written / store_bytes is
    // how many times the stream rewrote its own store.
    val bytesWritten = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            bytesWritten.addAndGet(e.taskMetrics.outputMetrics.bytesWritten)
            ()
          }
      })

    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir#$nBatches".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val base = Scratch.dir("graft-storeprobe", tag)
    val spool = s"$base/spool"
    val store = s"$base/store"
    val ckpt = s"$base/ckpt"

    // Spool the events into nBatches files (setup, untimed): the probe
    // measures the store tier, not this rewrite. round_robin via
    // repartition(n) without keys — even batch sizes.
    val ev = Tables.load(spark, sfDir, "events")
    val nEvents = ev.count()
    ev.repartition(nBatches).write.mode("overwrite").parquet(spool)

    // --- 1. streaming ingest through the real maintenance query ---
    val raw = spark.read.parquet(spool)
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(spool)
    val (_, tIngest) = timed {
      val q = streaming.EventStreams.maintainEdgeStore(
        stream, store, checkpointDir = Some(ckpt), availableNow = true)
      q.awaitTermination()
    }
    val gens = streaming.EventStreams.committedGenerations(store)
    val ingestBytesWritten = bytesWritten.get()
    val edgesAfterIngest =
      streaming.EventStreams.edgeStore(spark, store).count()
    val storeBytes0 = duBytes(store)
    val storeFiles0 = fileCount(store)
    val ckptBytes = duBytes(ckpt)

    // --- 2. components over the live snapshot (pre-compaction: the
    // small-files read path a long-running store serves from) ---
    def componentsOverStore(gen: Int): Array[org.apache.spark.sql.Row] = {
      val pairs = streaming.EventStreams
        .edgeStoreAt(spark, store, gen)
        .select(concat(lit("U"), col("user_id").cast("string")).as("d1"),
          concat(lit("P"), col("product_id").cast("string")).as("d2"))
        .distinct()
      graph.GraphAlgs
        .pairComponents(pairs, streaming.EventStreams.StoreComponentsRounds)
        .groupBy("comp").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_components"))
        .orderBy("size").collect()
    }
    val (compPre, tComponentsPre) = timed(componentsOverStore(gens.last))

    // --- 3. OPTIMIZE pass + the same query over the compacted layout ---
    val (_, tCompact) = timed {
      streaming.EventStreams.compactEdgeStore(spark, store)
    }
    val storeBytes1 = duBytes(store)
    val storeFiles1 = fileCount(store)
    val gensAfter = streaming.EventStreams.committedGenerations(store)
    val (compPost, tComponentsPost) =
      timed(componentsOverStore(gensAfter.last))
    // Row-set identity across the OPTIMIZE: a compaction that changes
    // query results is corruption, not maintenance.
    require(compPre.map(_.toString).toSeq == compPost.map(_.toString).toSeq,
      "components changed across compaction")

    val edgesAfterCompact =
      streaming.EventStreams.edgeStore(spark, store).count()
    require(edgesAfterIngest == edgesAfterCompact,
      s"edge count drifted across compaction: " +
        s"$edgesAfterIngest -> $edgesAfterCompact")

    println(
      s"""{"probe":"store_scale","sf_dir":"$sfDir","n_events":$nEvents,""" +
      s""""n_batches":$nBatches,"ingest_sec":${f"$tIngest%.1f"},""" +
      s""""events_per_sec":${f"${nEvents / math.max(tIngest, 1e-9)}%.0f"},""" +
      s""""generations_committed":${gens.length},""" +
      s""""n_edges":$edgesAfterIngest,""" +
      s""""ingest_bytes_written":$ingestBytesWritten,""" +
      s""""store_bytes_pre":$storeBytes0,"store_files_pre":$storeFiles0,""" +
      s""""ckpt_bytes":$ckptBytes,""" +
      s""""components_pre_sec":${f"$tComponentsPre%.1f"},""" +
      s""""compact_sec":${f"$tCompact%.1f"},""" +
      s""""store_bytes_post":$storeBytes1,"store_files_post":$storeFiles1,""" +
      s""""generations_after_gc":${gensAfter.length},""" +
      s""""components_post_sec":${f"$tComponentsPost%.1f"}}""")
    spark.stop()
  }
}
