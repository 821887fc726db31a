package graft

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("forward fill carries the latest at-or-before value onto each grid tick") {
    val h = 3600L * 1000000
    // user 1: v=1.0 at t=0h, v=2.0 at t=7h → ticks 0h and 6h both read 1.0.
    // user 2: two events at the SAME ts — max event_id (v=9.0) wins.
    val ev = Seq(
      (1L, 0L, 10L, 1.0), (1L, 7 * h, 11L, 2.0),
      (2L, 6 * h, 20L, 5.0), (2L, 6 * h, 21L, 9.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = graft.operators.Resample.eventValuesFfillOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, 0L, 1.0), (1L, 6 * h, 1.0), (2L, 6 * h, 9.0)))
  }

  test("a genuinely NULL latest value is carried as null, not skipped") {
    val h = 3600L * 1000000
    // ASOF semantics: the tick reads the MATCHED row's value even when
    // that value is null — it must NOT fall back to the older 1.0.
    val ev = Seq(
      (1L, 0L, 10L, Some(1.0)), (1L, 5 * h, 11L, None),
      (1L, 13 * h, 12L, Some(3.0)))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = graft.operators.Resample.eventValuesFfillOf(ev).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq === Seq(
      (0L, Some(1.0)), (6 * h, None), (12 * h, None)))
  }
}

import graft.operators.AsofJoin

/** Hand-checkable as-of semantics on the seed fixture:
  * orders O1(C1 @04-01), O2(C2 @04-02), O3(C1 @04-05);
  * events all in May → each event sees the user's latest order;
  * C3 has no orders → null. */
class AsofJoinSpec extends SparkTestBase {

  test("each event matches the most recent at-or-before order per user") {
    val rows = AsofJoin.eventsToLastOrder(spark, SeedFixture.dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows(1L) == Some(3L)) // C1's latest order is O3
    assert(rows(2L) == Some(3L))
    assert(rows(3L) == None)     // C3 never ordered
    assert(rows(4L) == Some(2L)) // C2 → O2
    assert(rows(5L) == Some(2L))
  }

  test("events before any order get null, not a future order") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-asof").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((10L, 1L, ts("2024-06-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, ts("2024-05-01 00:00:00"), 1L),   // before the order
        (2L, ts("2024-06-01 00:00:00"), 1L),   // exactly at it (inclusive)
        (3L, ts("2024-07-01 00:00:00"), 1L))   // after it
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$d/events.parquet")
    val rows = AsofJoin.eventsToLastOrder(spark, d).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(10L), 3L -> Some(10L)))
  }

  test("EWMA halves its way along the daily series, exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // Daily cent totals 100, 300, 500 → EWMA recurrence (y+x)/2 from 0:
    // 50, 175, 337.5 cents = 0.5, 1.75, 3.375 dollars.
    Seq((1L, 1L, ts("2024-01-01"), 1.00),
        (2L, 1L, ts("2024-01-02"), 2.00), (3L, 1L, ts("2024-01-02"), 1.00),
        (4L, 1L, ts("2024-01-03"), 5.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    val rows = operators.Resample.ewmaDailyRevenue(spark, d).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1L, 1.0, 0.5), (2L, 3.0, 1.75),
      (1L, 5.0, 3.375)))
  }
}
