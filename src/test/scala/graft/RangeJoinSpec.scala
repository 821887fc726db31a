package graft

import graft.operators.{RangeJoin, Relational}

class RangeJoinSpec extends SparkTestBase {

  test("bucketized range join equals the naive band join on a known fixture") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-range").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: orders at day 0, day 10, day 40; user 2: day 0 only
    Seq((1L, 1L, ts("2024-01-01 00:00:00")),
        (2L, 1L, ts("2024-01-11 00:00:00")),
        (3L, 1L, ts("2024-02-10 00:00:00")),
        (4L, 2L, ts("2024-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    // events: user 1 at day 5 (near orders 1,2), user 1 at day 25
    // (near order 2 at 14d boundary exactly: 2024-01-25 vs 01-11 = 14d),
    // user 2 at day 20 (nothing within 14d), user 3 (no orders)
    Seq((1L, ts("2024-01-06 00:00:00"), 1L),
        (2L, ts("2024-01-25 00:00:00"), 1L),
        (3L, ts("2024-01-21 00:00:00"), 2L),
        (4L, ts("2024-01-05 00:00:00"), 3L))
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$d/events.parquet")
    val rows = RangeJoin.eventsNearOrders(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val day = 24L * 3600 * 1000000L
    // event 1: orders day0 (5d away) and day10 (5d away) → n=2, closest 5d
    assert(rows(1L) == ((2L, 5 * day)))
    // event 2: order day10 exactly 14d away (inclusive) → n=1
    assert(rows(2L) == ((1L, 14 * day)))
    // events 3 and 4: no orders in range → absent (inner semantics)
    assert(!rows.contains(3L) && !rows.contains(4L))
  }

  test("approximate median lands within 1% of the exact median") {
    val r = Relational.approxQuantiles(spark, "/root/testdata/sf0.001").head()
    val (approx, exact) = (r.getDouble(0), r.getDouble(1))
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx $approx vs exact $exact")
  }
}
