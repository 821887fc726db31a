package graft

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
}
