package graft

import graft.operators.Recs

/** Hand-computable /recs semantics on the reference seed (FIXTURES.md §2):
  * orders O1={P1,P2}, O2={P3}, O3={P4,P2}. */
class RecsSpec extends SparkTestBase {
  private def dir = SeedFixture.dir

  test("co-occurrence for P2 is {P1:1, P4:1} (via O1, O3)") {
    val rows = Recs.coOccurrence(spark, dir, 2L).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 1.0), (4L, 1.0)))
  }

  test("co-occurrence for P3 is empty (O2 is a singleton basket)") {
    assert(Recs.coOccurrence(spark, dir, 3L).isEmpty)
  }

  test("same-category fallback for P3 is empty (only book in CAT2)") {
    assert(Recs.sameCategory(spark, dir, 3L).isEmpty)
  }

  test("same-category for P1 returns CAT1 peers {P2, P4} at score 1.0") {
    val rows = Recs.sameCategory(spark, dir, 1L).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((2L, 1.0), (4L, 1.0)))
  }

  test("product fallback cascade lands on same-category when co-occurrence is empty") {
    // P3 co-occurs with nothing and has no category peers → fully empty.
    assert(Recs.recsForProduct(spark, dir, 3L).isEmpty)
    // P2 has co-occurrence → cascade returns the primary result.
    val primary = Recs.recsForProduct(spark, dir, 2L).collect()
    assert(primary.map(_.getString(2)).forall(_ == "co-occurrence"))
  }

  test("customer C1 recs: anti-join removes all already-purchased candidates") {
    // C1 bought {P1,P2,P4}; every co-occurring product is already owned.
    assert(Recs.customerRecs(spark, dir, 1L).isEmpty)
    // Fallback: CAT1 minus purchased {P1,P2,P4} is empty too.
    assert(Recs.customerCategoryRecs(spark, dir, 1L).isEmpty)
  }

  test("customer C2 recs: singleton basket yields empty, category fallback empty") {
    assert(Recs.customerRecs(spark, dir, 2L).isEmpty)
    assert(Recs.customerCategoryRecs(spark, dir, 2L).isEmpty)
  }

  test("customer recs score counts path bindings: a co-order holding 2 of the customer's products scores 2") {
    // Cypher count(*) multiplicity (reference main.py:88-104): C1 owns O1 =
    // {P10, P11}; O2 (C2) = {P10, P11, P12} reaches P12 through BOTH P10
    // and P11 → score(P12) = 2, not 1. O3 (C3) = {P11, P12} adds 1 → 3.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mult").toString
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 10L, 1), (1L, 11L, 2),
        (2L, 10L, 1), (2L, 11L, 2), (2L, 12L, 3),
        (3L, 11L, 1), (3L, 12L, 2))
      .toDF("l_orderkey", "l_partkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = Recs.customerRecs(spark, d, 1L).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((12L, 3.0, "co-occurrence")))
  }

  test("sweep cascade elects the same-category fallback when co-occurrence is empty") {
    // No real seed at any shipped SF has an empty first arm (checked at
    // sf0.01: every product co-occurs with something), so the election
    // of the fallback arm is pinned on a constructed corpus instead:
    // P1 (1 ≡ 1 mod 7 → in the sweep) sits alone in O1 → co empty, but
    // shares CAT1 with P8 → the cascade must land on 'same-category'.
    // P8 (8 ≡ 1 mod 7) has real co-occurrence → first arm elected. The
    // three out-of-domain sweep seeds must come back 'none'.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-sweep").toString
    Seq((1L, "CAT1"), (8L, "CAT1"), (2L, "CAT2"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq((1L, 1L), (2L, 8L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 1L), (2L, 8L), (2L, 2L)).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq(1L, 8L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val rows = Recs.coOccurrenceSweep(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == (("same-category", 8L, 1.0)))
    assert(rows(8L) == (("co-occurrence", 2L, 1.0)))
    for (m <- Recs.SweepMissingSeeds)
      assert(rows(m) == (("none", -1L, 0.0)), s"missing seed $m")
    // Customer side: C1 bought only P1 (no co-order) → fallback to
    // CAT1 \ {P1} = {P8}; C8 bought {P8, P2} (whole catalog of its
    // cats minus mine = {P1}) → fallback too.
    val crows = Recs.customerRecsSweep(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(crows(1L) == (("same-category", 8L, 1.0)))
    assert(crows(8L) == (("same-category", 1L, 1.0)))
    for (m <- Recs.SweepMissingSeeds)
      assert(crows(m) == (("none", -1L, 0.0)), s"missing cust seed $m")
  }

  test("sweep rows agree with the single-seed builders at sf0.001") {
    // The sweep is a set-based reformulation of the per-seed pipelines;
    // its elected top-1 must equal row 1 of the single-seed builder for
    // every swept seed (sampled: first/last/middle — full parity is the
    // oracle's job, this pins the Scala-vs-Scala reformulation).
    val sf = "/root/testdata/sf0.001"
    val sweep = Recs.coOccurrenceSweep(spark, sf).collect()
      .filter(_.getString(1) == "co-occurrence")
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(sweep.length > 5)
    for ((seed, t1, s1) <- Seq(sweep.head, sweep(sweep.length / 2),
        sweep.last)) {
      val one = Recs.coOccurrence(spark, sf, seed).head()
      assert(one.getLong(0) == t1 && one.getDouble(1) == s1,
        s"seed $seed: sweep ($t1, $s1) vs single (${one.getLong(0)}, ${one.getDouble(1)})")
    }
    val csweep = Recs.customerRecsSweep(spark, sf).collect()
      .filter(_.getString(1) == "co-occurrence")
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(csweep.length > 5)
    for ((seed, t1, s1) <- Seq(csweep.head, csweep(csweep.length / 2),
        csweep.last)) {
      val one = Recs.customerRecs(spark, sf, seed).head()
      assert(one.getLong(0) == t1 && one.getDouble(1) == s1,
        s"cust seed $seed: sweep ($t1, $s1) vs single (${one.getLong(0)}, ${one.getDouble(1)})")
    }
  }

  test("negative sampling: candidates minus purchases, hand-checkable") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-neg").toString
    Seq(1L, 2L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    // Popularity by distinct orders: P2:3, P1:1, P3:1.
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = Recs.negativeSamples(spark, d, nCand = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // C1 bought {P1,P2} → only negative is P3; C2 bought {P2,P3} → P1.
    assert(rows.toSeq == Seq((1L, 3L, 1L, 1L), (2L, 1L, 1L, 1L)))
  }

  test("negative sampling invariants at sf0.001: no purchased pair, " +
    "ranks contiguous from 1, ≤k per customer") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val neg = Recs.negativeSamples(spark, sf)
    val pur = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("order_id"),
        col("l_partkey").as("product_id"))
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey").as("order_id"),
          col("o_custkey").as("custkey")), "order_id")
      .select("custkey", "product_id").distinct()
    assert(neg.join(pur, Seq("custkey", "product_id")).isEmpty)
    val bad = neg.groupBy("custkey")
      .agg(max("neg_rank").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") || col("n") > 3)
    assert(bad.isEmpty)
  }

  test("rrf fusion combines both arm rankings and outranks single-arm hits") {
    val sf = "/root/testdata/sf0.001"
    val big = 1 << 30 // un-truncated arm rankings
    val co = Recs.coOccurrence(spark, sf, 1L, k = big).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val coRank = co.sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val catRank = Recs.sameCategory(spark, sf, 1L, k = big).collect()
      .map(_.getLong(0)).sorted.zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val expect = (coRank.keySet ++ catRank.keySet).toSeq
      .map { id =>
        val s = coRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          catRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (id, s, coRank.contains(id).compare(false) +
          catRank.contains(id).compare(false))
      }
      .sortBy { case (id, s, _) => (-s, id) }.take(10)
    val got = Recs.rrfFusion(spark, sf, 1L).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.toSeq == expect)
    // Fusion semantics: any two-arm product beats every one-arm product
    // whose best rank is not better in BOTH arms — weaker but sufficient
    // smoke: the top row must be a genuine fusion when any overlap exists.
    if (expect.exists(_._3 == 2)) assert(got.head._3 == 2 ||
      got.head._2 > expect.filter(_._3 == 2).map(_._2).max - 1e-12)
  }

  test("session co-visitation pairs within sessions, never across") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-covisit").toString
    def ts(min: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-05-01 10:00:00").getTime + min * 60000L)
    Seq(
      // u1 session A: views 1, 2 → pair (1,2)
      (1L, ts(0), 1L, "view", """{"k": 1}"""),
      (2L, ts(1), 1L, "view", """{"k": 2}"""),
      // u1 session B (2h later): view 3 alone → no pair with session A
      (3L, ts(120), 1L, "view", """{"k": 3}"""),
      // u2 one session: views 1, 2 → (1,2) again
      (4L, ts(0), 2L, "view", """{"k": 1}"""),
      (5L, ts(2), 2L, "view", """{"k": 2}"""),
      // a purchase carrying k must NOT create view pairs
      (6L, ts(3), 2L, "purchase", """{"k": 3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "props")
      .write.parquet(s"$d/events.parquet")
    val rows = Recs.sessionCovisitation(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 2L, 2L)))
  }

  test("CONTAINS edge set collapses duplicate order-items (MERGE semantics)") {
    // Doubled input must produce the identical edge set (A6 idempotency).
    val once = Recs.containsEdges(spark, SeedFixture.dir).collect().toSet
    val twice = Recs.containsEdges(spark, SeedFixture.dirX2).collect().toSet
    assert(once == twice && once.size == 5)
  }

  test("ALS recs: deterministic, purchased excluded, positives outscore " +
    "negatives") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val recs = Recs.alsRecs(spark, sf, 1L, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(recs.nonEmpty && recs.length <= 10)
    val scores = recs.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val purchased = Recs.purchasedProducts(spark, sf, 1L).collect()
      .map(_.getLong(0)).toSet
    assert(recs.forall(r => !purchased(r._1)))
    // seeded training: a second serving call reproduces the list
    val again = Recs.alsRecs(spark, sf, 1L, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq == recs.toSeq)
    // contrastive floor: the model scores real interactions above the
    // deterministic negative samples, on average (the honest quality
    // gate for a learned arm — counting arms need no such check)
    import spark.implicits._
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pos = Tables.load(spark, sf, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"),
        col("l_partkey").as("product_id")).distinct()
    val neg = Recs.negativeSamples(spark, sf)
      .select("custkey", "product_id")
    def meanScore(pairs: org.apache.spark.sql.DataFrame): Double =
      Recs.alsPredict(spark, sf, pairs)
        .agg(org.apache.spark.sql.functions.avg("prediction"))
        .head.getDouble(0)
    val (mp, mn) = (meanScore(pos), meanScore(neg))
    assert(mp > mn, s"positives $mp should outscore negatives $mn")
  }
}
