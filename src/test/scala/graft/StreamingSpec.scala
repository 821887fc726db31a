package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{ClosedSession, SessionEvent}

/** Batch/stream plan equivalence (the Phase-S correctness argument):
  * the same transform over a MemoryStream must converge to the batch
  * result over the same rows. */
class StreamingSpec extends SparkTestBase {

  private def seedEventsDf = {
    import spark.implicits._
    SeedFixture.events.toDF()
  }

  test("windowed counts over a stream equal the batch plan on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeedFixture.Event]
    mem.addData(SeedFixture.events: _*)
    val q = EventStreams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStreams.windowedCounts(seedEventsDf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows over a stream equal the batch plan; each event lands twice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeedFixture.Event]
    mem.addData(SeedFixture.events: _*)
    val q = EventStreams.slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("slide_counts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStreams.slidingCounts(seedEventsDf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && batch.nonEmpty)
      // 1h window / 30m slide: total count doubles the event count
      assert(batch.toSeq.map(_._3).sum == 2L * SeedFixture.events.length)
    } finally q.stop()
  }

  test("windowed top-k: stream pre-aggregation + serving-time rank equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeedFixture.Event]
    mem.addData(SeedFixture.events: _*)
    val q = EventStreams.windowProductCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_prod_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = EventStreams
        .rankWindowCounts(spark.table("win_prod_counts")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val batch = EventStreams
        .rankWindowCounts(EventStreams.windowProductCounts(seedEventsDf))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(streamed.toSeq == batch.toSeq && batch.nonEmpty)
      // the 10:00 window holds two product-3 events → rank 1 with n=2
      assert(batch.exists { case (_, rk, pid, n) => rk == 1 && pid == 3 && n == 2 })
    } finally q.stop()
  }

  test("streaming dedup maintains one behavioral edge per (user, product, type)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeedFixture.Event]
    // Feed the seed events twice across two microbatches: the dedup state
    // must collapse the replay (A6 within watermark).
    mem.addData(SeedFixture.events: _*)
    val q = EventStreams.dedupedBehavioralEdges(mem.toDF())
      .writeStream.format("memory").queryName("edges_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(SeedFixture.events: _*)
      q.processAllAvailable()
      val streamed = spark.table("edges_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(streamed.length == streamed.distinct.length)
      val batch = EventStreams.dedupedBehavioralEdges(seedEventsDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(streamed.toSet == batch.toSet && batch.length == 5)
    } finally q.stop()
  }

  test("stream funnel stages across microbatches equal the batch funnel counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Real sf0.001 events replayed in ts order, split across microbatches.
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("event_type")).as("et"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("ts_us"))
    val rows = ev.as[EventStreams.FunnelEvent].collect().sortBy(_.ts_us)
    val mem = MemoryStream[EventStreams.FunnelEvent]
    val q = EventStreams.funnelStages(mem.toDS())
      .writeStream.format("memory").queryName("funnel_stages")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val byStage = spark.table("funnel_stages").collect()
        .groupBy(_.getInt(1)).view.mapValues(_.length.toLong).toMap
      val b = graft.operators.Funnel.conversionCountsOf(ev).head()
      assert(byStage.getOrElse(1, 0L) == b.getLong(0))
      assert(byStage.getOrElse(2, 0L) == b.getLong(1))
      assert(byStage.getOrElse(3, 0L) == b.getLong(2))
      assert(b.getLong(0) > 0)
    } finally q.stop()
  }

  test("stream gap buckets across microbatches equal the batch histogram") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("ts_us"),
        org.apache.spark.sql.functions.col("event_id"))
    val rows = ev.as[(Long, Long, Long)].collect().sortBy(_._2)
      .map(t => EventStreams.GapEvent(t._1, t._2))
    val mem = MemoryStream[EventStreams.GapEvent]
    val q = EventStreams.gapBuckets(mem.toDS())
      .writeStream.format("memory").queryName("gap_buckets")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("gap_buckets").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
      val batch = graft.operators.EventGaps.gapHistogramOf(ev).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("stream transition pairs across microbatches equal the batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val f = org.apache.spark.sql.functions
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(f.col("user_id"), f.unix_micros(f.col("ts")).as("ts_us"),
        f.col("event_id"), f.lower(f.col("event_type")).as("et"))
      .as[(Long, Long, Long, String)].collect()
      .sortBy(t => (t._2, t._3))
      .map(t => EventStreams.TransEvent(t._1, t._2, t._3, t._4))
    val mem = MemoryStream[EventStreams.TransEvent]
    val q = EventStreams.transitionPairs(mem.toDS())
      .writeStream.format("memory").queryName("trans_pairs")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("trans_pairs").collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
        .view.mapValues(_.length.toLong).toMap
      val batch = EventStreams
        .transitionCountsBatch(spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions across microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000000L // one hour in micros
      // t0 > 0: an event AT the initial watermark (epoch 0) is late data
      val t0 = java.sql.Timestamp.valueOf("2024-05-01 10:00:00").getTime * 1000L
      // batch 1: user 1 has two events 10 min apart (one open session)
      mem.addData(SessionEvent(1L, t0), SessionEvent(1L, t0 + 600L * 1000000L))
      q.processAllAvailable()
      assert(spark.table("sessions_stream").isEmpty) // nothing closed yet
      // batch 2: an event 2h later closes the first session
      mem.addData(SessionEvent(1L, t0 + 2 * h))
      q.processAllAvailable()
      val closed = spark.table("sessions_stream").as[ClosedSession].collect()
      assert(closed.toSeq ==
        Seq(ClosedSession(1L, t0, t0 + 600L * 1000000L, 2L)))
    } finally q.stop()
  }

  test("watermark flushes the final open session without another event from that user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_flush")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000000L
      val t0 = java.sql.Timestamp.valueOf("2024-05-01 10:00:00").getTime * 1000L
      // user 1's session would stay open forever under NoTimeout
      mem.addData(SessionEvent(1L, t0), SessionEvent(1L, t0 + 600L * 1000000L))
      q.processAllAvailable()
      // user 2's events push the watermark past user 1's last + gap; the
      // second batch runs with that advanced watermark and fires the
      // EventTimeTimeout (no reliance on a no-data microbatch).
      mem.addData(SessionEvent(2L, t0 + 2 * h))
      q.processAllAvailable()
      mem.addData(SessionEvent(2L, t0 + 2 * h + 60L * 1000000L))
      q.processAllAvailable()
      val closed = spark.table("sessions_flush").as[ClosedSession].collect()
      assert(closed.toSeq ==
        Seq(ClosedSession(1L, t0, t0 + 600L * 1000000L, 2L)))
    } finally q.stop()
  }

  test("stream sessionizer equals sessionsBatch exactly, including last sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_eq")
      .outputMode("append").start()
    try {
      def us(t: java.sql.Timestamp) = t.getTime * 1000L
      mem.addData(SeedFixture.events.map(e =>
        SessionEvent(e.user_id, us(e.ts))): _*)
      q.processAllAvailable()
      // Sentinel user advances the watermark past every real session's
      // timeout; two batches so the fire happens inside a data batch.
      val far = us(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
      mem.addData(SessionEvent(99L, far))
      q.processAllAvailable()
      mem.addData(SessionEvent(99L, far + 3600L * 1000000L))
      q.processAllAvailable()
      val streamed = spark.table("sessions_eq").as[ClosedSession].collect()
        .filter(_.user_id != 99L)
        .map(c => (c.user_id, c.session_start_us, c.session_end_us, c.n_events))
        .toSet
      val batch = EventStreams.sessionsBatch(spark, SeedFixture.dir).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(streamed == batch && batch.size == 4)
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 views product 7 at 10:00, purchases at 10:30 (within 1h) and
    // again at 12:00 (outside); user 2 purchases without a view.
    val evs = Seq(
      SeedFixture.Event(1, ts("2024-05-01 10:00:00"), 1, "view", 1.0, """{"k": 7}"""),
      SeedFixture.Event(2, ts("2024-05-01 10:30:00"), 1, "purchase", 1.0, """{"k": 7}"""),
      SeedFixture.Event(3, ts("2024-05-01 12:00:00"), 1, "purchase", 1.0, """{"k": 7}"""),
      SeedFixture.Event(4, ts("2024-05-01 10:30:00"), 2, "purchase", 1.0, """{"k": 9}"""))
    val mem = MemoryStream[SeedFixture.Event]
    val stream = mem.toDF()
    val joined = EventStreams.viewToPurchasePairs(
      stream.filter(org.apache.spark.sql.functions.col("event_type") === "view"),
      stream.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"))
    val q = joined.writeStream.format("memory")
      .queryName("attrib_pairs").outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib_pairs")
        .select("v_user", "v_k").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.toSeq == Seq((1L, 7L))) // only the in-window purchase
      val batchDf = evs.toDF()
      val batch = EventStreams.viewToPurchasePairs(
        batchDf.filter(org.apache.spark.sql.functions.col("event_type") === "view"),
        batchDf.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"))
        .select("v_user", "v_k").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("foreachBatch edge store converges to the batch edge set across replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-edges")
      .resolve("store").toString
    val mem = MemoryStream[SeedFixture.Event]
    val q = EventStreams.maintainEdgeStore(mem.toDF(), store)
    try {
      mem.addData(SeedFixture.events.take(2): _*)
      q.processAllAvailable()
      mem.addData(SeedFixture.events: _*) // replay everything (dups)
      q.processAllAvailable()
      val stored = EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = EventStreams.dedupedBehavioralEdges(seedEventsDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(stored == batch && batch.size == 5)
    } finally q.stop()
  }

  test("edge store merges only touched partitions; untouched dirs are referenced in place") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-edges-part")
      .resolve("store").toString
    val mem = MemoryStream[SeedFixture.Event]
    val q = EventStreams.maintainEdgeStore(mem.toDF(), store)
    try {
      // batch 1: a view and a click → VIEWED and CLICKED partitions
      mem.addData(SeedFixture.events.take(2): _*)
      q.processAllAvailable()
      val gen1 = EventStreams.currentGen(store).get
      val man1 = EventStreams.manifest(store)
      def fileBytes(p: org.apache.hadoop.fs.Path): Map[String, Seq[Byte]] =
        new java.io.File(p.toUri.getPath).listFiles().filter(_.isFile)
          .map(f => f.getName ->
            java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
      val viewedBefore = man1("VIEWED").map(fileBytes)
      // batch 2 touches only ADDED_TO_CART
      mem.addData(SeedFixture.events(4))
      q.processAllAvailable()
      val gen2 = EventStreams.currentGen(store).get
      assert(gen2.getName != gen1.getName)
      val man2 = EventStreams.manifest(store)
      // Untouched partition: neither copied nor rewritten — the new
      // snapshot references the SAME delta chain (zero-I/O carry-over)
      // and its bytes are untouched.
      assert(man2("VIEWED") == man1("VIEWED"))
      assert(man2("VIEWED").map(fileBytes) == viewedBefore)
      // Touched partition: its newest delta lives in the new generation.
      assert(man2("ADDED_TO_CART").last.getParent.getName == gen2.getName)
    } finally q.stop()
  }

  test("edge store write path refuses a degraded manifest; reads still degrade") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-edges-strict")
      .resolve("store").toString
    val mem = MemoryStream[SeedFixture.Event]
    val q = EventStreams.maintainEdgeStore(mem.toDF(), store)
    try {
      mem.addData(SeedFixture.events.take(2): _*) // VIEWED + CLICKED
      q.processAllAvailable()
      mem.addData(SeedFixture.events(4)) // new gen; VIEWED carried forward
      q.processAllAvailable()
    } finally q.stop()
    // Damage the store: delete a data dir the live manifest carries.
    val viewedDir = new java.io.File(
      EventStreams.manifest(store)("VIEWED").head.toUri.getPath)
    viewedDir.listFiles().foreach(_.delete()); viewedDir.delete()
    // READ path: expired/degraded snapshot → empty typed frame.
    assert(EventStreams.edgeStore(spark, store).isEmpty)
    // WRITE path: a merge must FAIL LOUDLY, not publish a generation
    // that silently drops the carried-forward partitions.
    val batch = Seq(SeedFixture.events(4)).toDF()
    val ex = intercept[java.io.IOException] {
      EventStreams.mergeEdgeBatch(
        EventStreams.dedupedBehavioralEdges(batch), store)
    }
    assert(ex.getMessage.contains("refusing to publish"))
  }

  test("edge store survives a simulated crash mid-build: partial generation is invisible and rebuilt") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-edges-crash")
      .resolve("store").toString
    val mem = MemoryStream[SeedFixture.Event]
    val q = EventStreams.maintainEdgeStore(mem.toDF(), store)
    try {
      mem.addData(SeedFixture.events.take(2): _*)
      q.processAllAvailable()
      val before = EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // Simulate a crash after the next build started but BEFORE publish:
      // a partial v2 exists with no _MANIFEST commit marker, so v1 stays
      // the live snapshot.
      val partial = new java.io.File(store, "v2/rel_type=VIEWED")
      partial.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(partial, "part-junk.parquet").toPath,
        Array[Byte](1, 2, 3))
      // Readers never see the partial generation.
      assert(EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet == before)
      // The next microbatch rebuilds v2 from scratch and publishes it.
      mem.addData(SeedFixture.events: _*)
      q.processAllAvailable()
      val stored = EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = EventStreams.dedupedBehavioralEdges(seedEventsDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(stored == batch && batch.size == 5)
    } finally q.stop()
  }

  test("edge store compaction rewrites partitions compactly, identical rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-edges-opt")
      .resolve("store").toString
    val mem = MemoryStream[SeedFixture.Event]
    val q = EventStreams.maintainEdgeStore(mem.toDF(), store)
    try {
      // Several microbatches → several touched-partition rewrites.
      SeedFixture.events.foreach { e =>
        mem.addData(e); q.processAllAvailable()
      }
      val before = EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val genBefore = EventStreams.currentGen(store).get.getName
      // Time travel: the previous committed generation (inside the GC
      // retention window) reads as the snapshot it was — a strict subset
      // of the live edge set here, since batches only ever add edges.
      val gens = EventStreams.committedGenerations(store)
      assert(gens.length >= 2)
      val older = EventStreams.edgeStoreAt(spark, store, gens(gens.length - 2))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(older.subsetOf(before) && older.size < before.size)
      // An expired/never-committed generation degrades to empty.
      assert(EventStreams.edgeStoreAt(spark, store, 999).isEmpty)
      EventStreams.compactEdgeStore(spark, store)
      // A NEW generation, same rows, and every live partition now holds
      // exactly one data file.
      assert(EventStreams.currentGen(store).get.getName != genBefore)
      val after = EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(after == before && before.size == 5)
      val man = EventStreams.manifest(store)
      man.values.foreach { chain =>
        assert(chain.length == 1,
          s"chain not folded by OPTIMIZE: ${chain.length} dirs")
        val files = new java.io.File(chain.head.toUri.getPath).listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"${chain.head} not compacted: ${files.length} files")
      }
      // An empty compaction on an empty store is a no-op, not a crash.
      EventStreams.compactEdgeStore(spark,
        java.nio.file.Files.createTempDirectory("graft-empty").toString)
    } finally q.stop()
  }

  test("file-replay source streams the testdata events to the same counts") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.windowedCounts(
        EventStreams.eventStream(spark, dir))
      .writeStream.format("memory").queryName("replay_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replay_counts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStreams.windowedCountsBatch(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  // ---- real file-source runs with checkpoint + kill + restart ----
  // MemoryStream equivalence shows the transforms; these show RECOVERY:
  // a checkpointed query killed mid-stream, restarted, must converge to
  // the batch result exactly once — including a forced REPLAY of the
  // crash-window batch (offsets written, commit marker lost: the state
  // every sink must absorb idempotently).

  /** Delete the newest commit marker so the restarted query re-runs that
    * batch — the standard simulation of a crash between the sink commit
    * and the checkpoint commit. */
  private def dropLatestCommit(ckpt: String): Unit = {
    val commits = new java.io.File(s"$ckpt/commits")
    val files = Option(commits.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit))
    assert(files.nonEmpty, "no committed batch to drop")
    val latest = files.maxBy(_.getName.toInt)
    // local FS keeps a checksum shadow; leaving it behind makes the
    // replayed commit's rename fail as a spurious concurrent writer
    new java.io.File(commits, s".${latest.getName}.crc").delete()
    assert(latest.delete())
  }

  private def commitCount(ckpt: String): Int =
    Option(new java.io.File(s"$ckpt/commits").listFiles())
      .getOrElse(Array.empty).count(_.getName.forall(_.isDigit))

  test("file-source edge store: kill mid-stream, replay crash-window batch, restart → exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("graft-restart-store")
    val in = base.resolve("in").toString
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    // several input files → several microbatches at maxFilesPerTrigger=1;
    // time-range slices so the watermarked dedup never sees late rows
    writeTimeOrderedSlices(ev, "ts", in, slices = 4)
    def stream() = {
      val schema = spark.read.parquet(in).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
    }
    // phase 1: process SOME of the input, then kill the query
    val q1 = EventStreams.maintainEdgeStore(stream(), store, Some(ckpt))
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (commitCount(ckpt) < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(commitCount(ckpt) >= 2, "stream never committed two batches")
    } finally q1.stop()
    // crash window: the last batch's merge reached the store but its
    // checkpoint commit is lost → the restart must replay it
    dropLatestCommit(ckpt)
    assert(EventStreams.committedGenerations(store).nonEmpty)
    // phase 2: restart from the same checkpoint and drain everything
    val q2 = EventStreams.maintainEdgeStore(stream(), store, Some(ckpt),
      availableNow = true)
    assert(q2.awaitTermination(120000),
      "restarted edge-store query did not drain within 120s")
    // exactly-once content: the store equals the batch dedup — the
    // replayed batch added nothing twice, the unprocessed files arrived
    val stored = EventStreams.edgeStore(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val batch = EventStreams.dedupedBehavioralEdges(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(stored.length == stored.distinct.length,
      "store holds duplicate edges after the replayed batch")
    assert(stored.toSet == batch.toSet)
    // no lost partitions: every rel_type the batch dedup produces is live
    assert(stored.map(_._3).toSet == batch.map(_._3).toSet)
  }

  /** Write `df` as `slices` contiguous time-range parquet files with
    * strictly increasing mtimes, so the file source delivers them as
    * microbatches in EVENT-TIME order. This matters twice: a watermarked
    * operator drops rows older than the watermark, so a later batch must
    * never carry earlier events; and the stateful extractors' exactness
    * contract is per-user time-ordered delivery (within a batch they
    * sort; across batches delivery order is the file order, which the
    * file source takes from mtime). */
  private def writeTimeOrderedSlices(df: org.apache.spark.sql.DataFrame,
      sortCol: String, in: String, slices: Int): Unit = {
    df.repartitionByRange(slices,
        org.apache.spark.sql.functions.col(sortCol))
      .write.parquet(in)
    // part-0000i holds range partition i (ascending): stamp mtimes in
    // file-name order so the source's mtime order IS time order.
    val files = Option(new java.io.File(in).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length >= 2, "expected multiple input slices")
    var mtime = System.currentTimeMillis() - 3600000
    files.foreach { f => assert(f.setLastModified(mtime)); mtime += 2000 }
  }

  private def sf0001FunnelInput: org.apache.spark.sql.DataFrame =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("event_type")).as("et"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("ts_us"),
        org.apache.spark.sql.functions.col("event_id"))

  /** Run a checkpointed file-source → parquet-sink query through the
    * kill / drop-commit / restart cycle and return the committed sink
    * rows (read through the sink's _spark_metadata log — the
    * exactly-once view). */
  private def killReplayRestart(in: String, out: String, ckpt: String)(
      start: (org.apache.spark.sql.DataFrame, String, String) =>
        org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.DataFrame = {
    val schema = spark.read.parquet(in).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q1 = start(stream(), out, ckpt)
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (commitCount(ckpt) < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(commitCount(ckpt) >= 2, "stream never committed two batches")
    } finally q1.stop()
    dropLatestCommit(ckpt)
    val q2 = start(stream(), out, ckpt)
    assert(q2.awaitTermination(120000),
      "restarted query did not drain within 120s")
    // the parquet batch read resolves through _spark_metadata: files of
    // replayed-but-superseded batch attempts are not visible
    spark.read.parquet(out)
  }

  test("file-source funnel with checkpoint survives kill + batch replay exactly once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart-funnel")
    val in = base.resolve("in").toString
    writeTimeOrderedSlices(sf0001FunnelInput, "ts_us", in, slices = 4)
    val sink = killReplayRestart(in, base.resolve("out").toString,
      base.resolve("ckpt").toString) { (stream, out, ckpt) =>
      EventStreams.funnelStages(
          stream.select("user_id", "et", "ts_us")
            .as[EventStreams.FunnelEvent])
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    val byStage = sink.collect().groupBy(_.getInt(1))
      .view.mapValues(_.length.toLong).toMap
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("event_type")).as("et"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("ts_us"))
    val b = graft.operators.Funnel.conversionCountsOf(ev).head()
    assert(byStage.getOrElse(1, 0L) == b.getLong(0))
    assert(byStage.getOrElse(2, 0L) == b.getLong(1))
    assert(byStage.getOrElse(3, 0L) == b.getLong(2))
    assert(b.getLong(0) > 0)
  }

  test("file-source transitions with checkpoint survive kill + batch replay exactly once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-restart-trans")
    val in = base.resolve("in").toString
    writeTimeOrderedSlices(sf0001FunnelInput, "ts_us", in, slices = 4)
    val sink = killReplayRestart(in, base.resolve("out").toString,
      base.resolve("ckpt").toString) { (stream, out, ckpt) =>
      EventStreams.transitionPairs(
          stream.select("user_id", "ts_us", "event_id", "et")
            .as[EventStreams.TransEvent])
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    val streamed = sink.collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.length.toLong).toMap
    val batch = EventStreams
      .transitionCountsBatch(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("time-travel window only lists fully readable snapshots after GC") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-edges-gc")
      .resolve("store").toString
    def batch(rel: String, uid: Long) =
      Seq((uid, 100L, rel)).toDF("user_id", "product_id", "rel_type")
    // deltaChainCap=1 forces fold-per-merge (the pre-delta behavior) so
    // the rewrite-then-GC scenario under test is reachable: with chains,
    // v3 would APPEND to A and keep v1's dir referenced forever.
    // v1 writes A; v2 touches B (carries A:v1 forward); v3 rewrites A;
    // v4 touches C → GC deletes v1. v2's DIR survives (the live manifest
    // still references B:v2) but v2's own snapshot references A:v1 —
    // unreadable, so it must drop out of the committed window.
    sys.props("spark.graft.store.deltaChainCap") = "1"
    try {
      EventStreams.mergeEdgeBatch(batch("VIEWED", 1L), store)
      EventStreams.mergeEdgeBatch(batch("CLICKED", 2L), store)
      EventStreams.mergeEdgeBatch(batch("VIEWED", 3L), store)
      EventStreams.mergeEdgeBatch(batch("ADDED_TO_CART", 4L), store)
    } finally sys.props.remove("spark.graft.store.deltaChainCap")
    assert(!new java.io.File(store, "v1").exists(), "v1 should be GC'd")
    assert(new java.io.File(store, "v2").exists(), "v2 dir is still referenced")
    val gens = EventStreams.committedGenerations(store)
    assert(!gens.contains(2), s"v2 is unreadable, yet listed: $gens")
    // Every listed generation actually reads — the window is honest.
    for (g <- gens)
      EventStreams.edgeStoreAt(spark, store, g).collect()
    // And the unpublished generation degrades to the empty typed frame
    // (never a partial snapshot, never an AnalysisException).
    val expired = EventStreams.edgeStoreAt(spark, store, 2)
    assert(expired.columns.toSeq ==
      Seq("user_id", "product_id", "rel_type") && expired.isEmpty)
    // The live snapshot still carries all four edges.
    assert(EventStreams.edgeStore(spark, store).count() == 4)
  }

  test("edge store merges append O(batch) deltas; the chain folds at the cap") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-edges-delta")
      .resolve("store").toString
    def batch(edges: (Long, Long)*) =
      edges.toSeq.map { case (u, p) => (u, p, "VIEWED") }
        .toDF("user_id", "product_id", "rel_type")
    def rawRows(p: org.apache.hadoop.fs.Path): Long =
      spark.read.parquet(p.toString).count()
    sys.props("spark.graft.store.deltaChainCap") = "3"
    try {
      // b1 seeds the partition; b2 and b3 append DELTAS: each new dir
      // holds ONLY its batch's rows (commit I/O is O(batch), the
      // write-amplification contract), even when the batch replays an
      // edge the chain already holds.
      EventStreams.mergeEdgeBatch(batch((1L, 100L)), store)
      EventStreams.mergeEdgeBatch(batch((1L, 100L), (2L, 100L)), store)
      val man2 = EventStreams.manifest(store)("VIEWED")
      assert(man2.length == 2, s"expected a 2-dir chain: $man2")
      assert(rawRows(man2.last) == 2,
        "delta dir must hold only the batch's rows, not the merged set")
      // Read-side dedup: the replayed (1,100) counts once.
      assert(EventStreams.edgeStore(spark, store).count() == 2)
      EventStreams.mergeEdgeBatch(batch((3L, 100L)), store)
      assert(EventStreams.manifest(store)("VIEWED").length == 3)
      // Time travel across delta generations stays exact.
      val gens = EventStreams.committedGenerations(store)
      assert(EventStreams.edgeStoreAt(spark, store, gens.head).count() == 1)
      // b4 hits the cap → the merge FOLDS chain ∪ batch into one exact
      // dir (per-partition minor compaction).
      EventStreams.mergeEdgeBatch(batch((4L, 100L)), store)
      val man4 = EventStreams.manifest(store)("VIEWED")
      assert(man4.length == 1, s"chain should fold at the cap: $man4")
      assert(rawRows(man4.head) == 4)
      assert(EventStreams.edgeStore(spark, store)
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    } finally sys.props.remove("spark.graft.store.deltaChainCap")
  }

  test("long backfill auto-compacts by policy: chains bounded, rows identical") {
    // VERDICT r12 item 6: the chain tax is bounded by PIPELINE POLICY —
    // maintainEdgeStore folds the store whenever a partition's chain
    // passes the read budget. Cap raised to 99 so the policy (not the
    // delta-chain cap) is provably what bounds the chain: without it an
    // 8-slice backfill ends at chain 8.
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-autocompact")
    val in = base.resolve("in").toString
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    writeTimeOrderedSlices(ev, "ts", in, slices = 8)
    sys.props("spark.graft.store.deltaChainCap") = "99"
    try {
      val schema = spark.read.parquet(in).schema
      val q = EventStreams.maintainEdgeStore(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in),
        store, Some(ckpt), availableNow = true)
      assert(q.awaitTermination(180000), "backfill did not drain")
      val chains = EventStreams.manifest(store).values.map(_.length)
      assert(chains.nonEmpty)
      assert(chains.max <= EventStreams.AutoCompactMaxChain,
        s"policy must bound every chain: $chains")
      // content-invariance: the compaction contract
      val stored = EventStreams.edgeStore(spark, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val batch = EventStreams.dedupedBehavioralEdges(ev).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(stored.toSet == batch.toSet && stored.nonEmpty)
      assert(stored.length == stored.distinct.length)
    } finally sys.props.remove("spark.graft.store.deltaChainCap")
  }

  test("concurrent committers serialize: every committed batch survives, no lost partitions") {
    // The declared contract (EventStreams.withCommitClaim): interleaved
    // mergeEdgeBatch committers on ONE store serialize via the
    // next-generation claim — each lands on a fresh generation, each
    // batch's rows AND every carried-forward partition survive. Two
    // writers × 4 batches of disjoint rows across two rel_type
    // partitions; the final snapshot must be the exact union.
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-ccommit")
      .resolve("store").toString
    def rows(t: Int, b: Int) = (0 until 10).map { i =>
      (t * 10000L + b * 100L + i, i.toLong,
        if (i % 2 == 0) "VIEWED" else "PURCHASED")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val tasks = (0 until 2).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try for (b <- 0 until 4)
            EventStreams.mergeEdgeBatch(
              rows(t, b).toDF("user_id", "product_id", "rel_type"), store)
          catch { case e: Throwable => errs.add(e); () }
        }
      })
    }
    start.countDown()
    tasks.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.isEmpty, s"committer failed: ${errs.peek()}")
    val got = EventStreams.edgeStore(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = (for (t <- 0 until 2; b <- 0 until 4; r <- rows(t, b))
      yield r).toSet
    assert(got == want,
      s"lost update: missing ${(want -- got).size}, extra ${(got -- want).size}")
    // No stray claim files left behind a clean run.
    val claims = new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".claim"))
    assert(claims.isEmpty, s"leaked claims: ${claims.mkString(",")}")
  }

  test("a crashed committer's stale claim is broken; a live claim is waited out") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val store = java.nio.file.Files.createTempDirectory("graft-claim")
      .resolve("store").toString
    EventStreams.mergeEdgeBatch(
      Seq((1L, 1L, "VIEWED")).toDF("user_id", "product_id", "rel_type"),
      store)
    // Stale claim (mtime past the TTL — a crashed committer): the next
    // merge must break it and commit.
    val stale = new org.apache.hadoop.fs.Path(store, "v2.claim")
    fs.create(stale, true).close()
    fs.setTimes(stale, System.currentTimeMillis() -
      EventStreams.ClaimTtlMs - 60000, -1)
    EventStreams.mergeEdgeBatch(
      Seq((2L, 1L, "VIEWED")).toDF("user_id", "product_id", "rel_type"),
      store)
    assert(EventStreams.edgeStore(spark, store).count() == 2)
    // Live claim (fresh mtime — an in-flight committer): the merge must
    // WAIT, then proceed once the holder releases.
    val live = new org.apache.hadoop.fs.Path(store, "v3.claim")
    fs.create(live, true).close()
    val releaser = new Thread(() => {
      Thread.sleep(1500)
      fs.delete(live, false); ()
    })
    releaser.start()
    val t0 = System.nanoTime()
    EventStreams.mergeEdgeBatch(
      Seq((3L, 1L, "VIEWED")).toDF("user_id", "product_id", "rel_type"),
      store)
    releaser.join()
    assert((System.nanoTime() - t0) / 1e9 > 1.0,
      "merge did not wait for the live claim")
    assert(EventStreams.edgeStore(spark, store).count() == 3)
  }
  test("claim mutex: exactly one of 16 concurrent claimers wins under the contract") {
    // The concurrency fact the whole commit protocol rests on, exercised
    // for real: N racing claimers on a contract-holding filesystem
    // (local → the NIO CREATE_NEW / O_EXCL branch) yield EXACTLY one
    // winner. The local FS can fake a lot, but not this — each thread
    // runs the production tryClaim with its own token.
    val dir = java.nio.file.Files.createTempDirectory("graft-claimrace")
    dir.toFile.deleteOnExit()
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem()
    raw.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val claim = new org.apache.hadoop.fs.Path(dir.toString, "v1.claim")
    val n = 16
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            start.await()
            EventStreams.tryClaim(raw, claim, s"tok-$i")
          }
        })
      }
      start.countDown()
      val wins = futures.count(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins === 1, s"claim mutex violated: $wins winners of $n")
    } finally pool.shutdown()
  }

  test("object-store test double (HEAD-then-PUT create) breaks the claim mutex — the refusal is load-bearing") {
    // A FilterFileSystem that implements create(overwrite=false) the way
    // S3-family Hadoop connectors do: an existence probe followed by an
    // unconditional PUT. A barrier holds both committers between the
    // probe and the PUT — the interleaving the connector cannot
    // prevent — and BOTH claimers then "win" the same claim file: the
    // exact lost-commit race requireClaimCapableFs refuses up front.
    // This pins the refusal to demonstrated behavior, not documentation.
    val dir = java.nio.file.Files.createTempDirectory("graft-claimdouble")
    dir.toFile.deleteOnExit()
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem()
    raw.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    // Not a Local/RawLocalFileSystem subclass → tryClaim takes the
    // generic FileSystem.create(path, overwrite=false) branch, like a
    // real remote-store connector.
    val lww = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def create(f: org.apache.hadoop.fs.Path,
                          overwrite: Boolean):
          org.apache.hadoop.fs.FSDataOutputStream = {
        if (!overwrite) {
          val absent = !fs.exists(f) // HEAD
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
          if (!absent) throw new java.io.IOException(s"$f exists")
          fs.create(f, true) // unconditional PUT — last writer wins
        } else fs.create(f, true)
      }
    }
    val claim = new org.apache.hadoop.fs.Path(dir.toString, "v1.claim")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = EventStreams.tryClaim(lww, claim, s"tok-$i")
        })
      }
      val wins = futures.count(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins === 2,
        s"expected the check-then-act double to hand BOTH committers " +
          s"the claim (got $wins) — if this starts passing with 1, the " +
          "double no longer models a last-writer-wins store")
    } finally pool.shutdown()
  }

  test("object-store schemes without atomic create-if-absent are refused loudly") {
    import spark.implicits._
    val batch = Seq((1L, 1L, "VIEWED")).toDF("user_id", "product_id", "rel_type")
    // The claim protocol's required primitive (atomic create-if-absent)
    // does not exist on S3-style last-writer-wins stores: rather than
    // silently degrade into the lost-commit race, every commit entry
    // point refuses the scheme up front, naming the contract. Fires
    // BEFORE any filesystem access, so no s3a connector is needed.
    for (bad <- Seq("s3a://bucket/store", "s3://bucket/store",
        "oss://bucket/store")) {
      val e = intercept[UnsupportedOperationException] {
        EventStreams.mergeEdgeBatch(batch, bad)
      }
      assert(e.getMessage.contains("atomic") &&
        e.getMessage.contains("create-if-absent"), e.getMessage)
    }
    // The streaming entry fails at query START, not inside the first
    // micro-batch.
    intercept[UnsupportedOperationException] {
      EventStreams.maintainEdgeStore(
        batch.withColumn("ts", org.apache.spark.sql.functions.current_timestamp()),
        "s3a://bucket/store")
    }
    // The acknowledgment escape hatch opens the gate (external commit
    // coordinator deployments); scheme check only - the merge then fails
    // later on the missing connector, which is fine: the CONTRACT gate
    // opened.
    sys.props("spark.graft.store.claimFs.unsafe") = "true"
    try intercept[Throwable] {
      EventStreams.mergeEdgeBatch(batch, "s3a://bucket/store")
    } match {
      case _: UnsupportedOperationException =>
        fail("gate still closed with the unsafe acknowledgment set")
      case _ => ()
    } finally { sys.props.remove("spark.graft.store.claimFs.unsafe"); () }
  }
}
