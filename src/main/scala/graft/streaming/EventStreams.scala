package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.operators.Relational

/** Phase S (SURVEY §2.8): the `events` table is stream-shaped (append-only,
  * monotone-ish `ts`) but the reference batch-scans it and drops `ts`
  * (reference `app/etl.py:161-164`). Here every transform is written once
  * against a DataFrame and works in BOTH modes: on `spark.read` it is a
  * batch plan with a DuckDB oracle; on `spark.readStream` Catalyst compiles
  * the identical plan incrementally (EliminateEventTimeWatermark removes
  * the watermark node in batch). That batch/stream equivalence is the
  * correctness argument for the streaming path — asserted in
  * StreamingSpec with a MemoryStream.
  *
  * Scale: windowed counts are partial-aggregated per microbatch and keyed
  * by (window, type) — state size is O(open windows × types), bounded by
  * the watermark. Dedup state is bounded the same way. Sessionization
  * keeps one small state row per active user.
  */
object EventStreams {

  /** File-replay streaming source over a testdata dir — how the driver
    * parquet becomes a stream (one file per microbatch). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Schema must match the physical file (ts = INT64 nanos); the
    // micros conversion happens on the stream, as in Tables.load.
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // The testdata table is a single file; the streaming file source wants
    // a directory → stream the dir with a glob pinned to the events table.
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    stream.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => stream
    }
  }

  /** Tumbling 1-hour counts per event type with a 10-minute watermark.
    * Emits epoch-micros window starts (engine-portable, oracle-stable). */
  def windowedCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))

  /** Sliding 1-hour windows every 30 minutes (each event lands in two
    * windows) — same batch/stream duality as windowedCounts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))

  /** Batch twin for the registry, totally ordered. */
  def slidingCountsBatch(spark: SparkSession, dir: String): DataFrame =
    slidingCounts(Tables.load(spark, dir, "events"))
      .orderBy("window_start_us", "event_type")

  /** A6-within-watermark: behavioral edge maintenance as streaming dedup —
    * one (user, product, rel_type) edge regardless of how many events
    * repeat it. In batch this is plain dropDuplicates; in streaming
    * `dropDuplicatesWithinWatermark` is the variant whose state the
    * watermark actually evicts (plain dropDuplicates without the event-
    * time column keeps every key forever — unbounded state). Duplicates
    * farther apart than the watermark re-emit; the downstream store merge
    * (maintainEdgeStore) absorbs them idempotently. */
  def dedupedBehavioralEdges(events: DataFrame): DataFrame = {
    val typed = events.withWatermark("ts", "10 minutes")
      .withColumn("rel_type", Relational.relTypeOf)
      .filter(col("rel_type").isNotNull)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
    val deduped =
      if (typed.isStreaming)
        typed.dropDuplicatesWithinWatermark("user_id", "k", "rel_type")
      else typed.dropDuplicates("user_id", "k", "rel_type")
    deduped.select(col("user_id"), col("k").as("product_id"), col("rel_type"))
  }

  /** Batch twin for the registry: edge counts per type after stream dedup. */
  def edgeCounts(spark: SparkSession, dir: String): DataFrame =
    dedupedBehavioralEdges(Tables.load(spark, dir, "events"))
      .groupBy("rel_type").agg(count(lit(1)).as("n"))
      .orderBy("rel_type")

  /** Batch twin for the registry: windowed counts, totally ordered. */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    windowedCounts(Tables.load(spark, dir, "events"))
      .orderBy("window_start_us", "event_type")

  /** Batch sessionization: 30-minute-gap sessions per user via window
    * functions (the lag/cumsum formulation every engine can express —
    * the DuckDB oracle mirrors it 1:1). */
  def sessionsBatch(spark: SparkSession, dir: String,
                    gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_no")
      .agg(min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess_no")
  }

  /** Stream-stream join with event-time bounds: purchases attributed to a
    * prior view of the same (user, product) within the attribution
    * window. In streaming, the watermark + time-range condition lets
    * Spark expire both join states; in batch the identical plan is a
    * plain range join (the oracle). Aggregated to attribution counts per
    * product for a bounded result. */
  def viewToPurchasePairs(views: DataFrame, purchases: DataFrame,
                          windowMinutes: Int = 60): DataFrame = {
    val v = views
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .select(col("user_id").as("v_user"), col("k").as("v_k"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val p = purchases
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .select(col("user_id").as("p_user"), col("k").as("p_k"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    v.join(p,
      col("v_user") === col("p_user") && col("v_k") === col("p_k") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
  }

  /** Batch twin for the registry: attribution counts, totally ordered. */
  def viewToPurchaseBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    viewToPurchasePairs(
      ev.filter(lower(col("event_type")) === "view"),
      ev.filter(lower(col("event_type")) === "purchase"),
      windowMinutes = 24 * 60) // 24 h: the window that attributes on this data
      .groupBy(col("p_k").as("product_id"))
      .agg(count(lit(1)).as("n_attributed"))
      .orderBy("product_id")
  }

  // ---- foreachBatch incremental edge-store maintenance (SURVEY §2.8) ----

  /** Incrementally maintain the behavioral edge store from the event
    * stream: each microbatch's deduped edges are merged into a parquet
    * store (read ∪ batch → dedup → overwrite). MERGE-upsert semantics
    * (A6) across the whole stream, arriving incrementally. At warehouse
    * scale the overwrite becomes a partition-level (or Delta/Iceberg
    * MERGE) operation keyed by rel_type; the merge logic is identical.
    * Returns the started query; the store directory is readable between
    * microbatches. */
  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  def maintainEdgeStore(events: DataFrame, storeDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    dedupedBehavioralEdges(events).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val incoming = batch.select("user_id", "product_id", "rel_type")
        val merged =
          if (new java.io.File(storeDir).exists())
            spark.read.parquet(storeDir).unionByName(incoming)
              .dropDuplicates("user_id", "product_id", "rel_type")
          else incoming.dropDuplicates("user_id", "product_id", "rel_type")
        // Can't overwrite a dir we're reading: stage → swap (a Delta/
        // Iceberg MERGE makes this transactional at warehouse scale).
        val staging = new java.io.File(storeDir + ".staging")
        merged.write.mode("overwrite").parquet(staging.getPath)
        val live = new java.io.File(storeDir)
        if (live.exists()) {
          val old = new java.io.File(storeDir + ".old")
          java.nio.file.Files.move(live.toPath, old.toPath)
          java.nio.file.Files.move(staging.toPath, live.toPath)
          deleteRec(old)
        } else java.nio.file.Files.move(staging.toPath, live.toPath)
        ()
      }
      .start()
  }

  // ---- Streaming-only stateful sessionization (flatMapGroupsWithState) ----

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class SessionState(start_us: Long, last_us: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long)

  /** Custom state machine: emit a session whenever a user's next event
    * arrives more than `gapMinutes` after the previous one. The open
    * session stays in GroupState with an EventTimeTimeout at
    * last_event + gap: once the watermark passes it the session flushes
    * WITHOUT needing another event from that user — so the stream
    * eventually emits exactly `sessionsBatch`, including each user's
    * final session (asserted in StreamingSpec). State is one small row
    * per active user and the timeout is the eviction, so it cannot grow
    * with stream length. Batch input has no watermark semantics →
    * NoTimeout (every session closes by the gap logic or is still open,
    * same as the window-function batch twin's trailing session). */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes")
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    val streaming = events.isStreaming

    def update(userId: Long, evs: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        // Watermark passed last_us + gap: the open session is final.
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(userId, s.start_us, s.last_us, s.n))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts_us)
        var cur = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.ts_us - s.last_us <= gapUs =>
              cur = Some(SessionState(s.start_us, e.ts_us, s.n + 1))
            case Some(s) =>
              closed += ClosedSession(userId, s.start_us, s.last_us, s.n)
              cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            case None =>
              cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (streaming)
            // Spark requires the timeout to be ahead of the watermark;
            // clamp for sessions already older than it (late data).
            state.setTimeoutTimestamp(math.max(s.last_us / 1000L + gapMs,
              state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    // EventTimeTimeout needs the watermarked event-time column to reach
    // the stateful operator, so carry `ets` through the grouping.
    if (streaming)
      events.withColumn("ets", timestamp_micros(col("ts_us")))
        .withWatermark("ets", watermarkDelay)
        .as[(Long, Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, evs: Iterator[(Long, Long, java.sql.Timestamp)],
           state: GroupState[SessionState]) =>
            update(uid, evs.map(t => SessionEvent(t._1, t._2)), state)
        }
    else
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(update)
  }
}
