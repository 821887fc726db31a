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

  test("CONTAINS edge set collapses duplicate order-items (MERGE semantics)") {
    // Doubled input must produce the identical edge set (A6 idempotency).
    val once = Recs.containsEdges(spark, SeedFixture.dir).collect().toSet
    val twice = Recs.containsEdges(spark, SeedFixture.dirX2).collect().toSet
    assert(once == twice && once.size == 5)
  }
}
