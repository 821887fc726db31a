package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties from SURVEY §5.3: MERGE idempotency, anti-join ⊆
  * complement, top-k = sort prefix. Spark job per case → few cases each. */
class PropsSpec extends SparkTestBase {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(5)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 99)))

  test("MERGE idempotency: dedup(x ∪ x) == dedup(x)") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = df.dropDuplicates("k", "v").collect().toSet
      val twice = df.union(df).dropDuplicates("k", "v").collect().toSet
      once == twice
    })
  }

  test("anti-join returns exactly left-keys minus right-keys") {
    import spark.implicits._
    check(Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val left = l.toDF("k", "v")
      val right = r.toDF("k", "v")
      val anti = left.join(right.select("k").distinct(), Seq("k"), "left_anti")
        .collect().map(_.getInt(0)).toSet
      val expected = l.map(_._1).toSet diff r.map(_._1).toSet
      anti == expected
    })
  }

  test("top-k by (desc value, asc key) equals the sorted prefix") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.distinct.toDF("k", "v")
      val topk = df.orderBy(desc("v"), asc("k")).limit(5)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val expected = rows.distinct
        .sortBy { case (k, v) => (-v, k) }
        .map { case (k, v) => (k, v) }.take(5)
      topk == expected
    })
  }
}
