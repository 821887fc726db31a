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

  private val wordGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "alpha alpha", "x")
  private val docsGen: Gen[List[String]] =
    Gen.listOfN(6, Gen.listOfN(12, wordGen).map(_.mkString(" ")))

  test("repetition fractions are bounded in [0, 1] on arbitrary token soups") {
    import spark.implicits._
    check(Prop.forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }
        .toDF("doc_id", "text")
      graft.text.TextAnalysis.repetitionOf(df).collect().forall { r =>
        (2 to 4).forall(c => r.isNullAt(c) ||
          (r.getDouble(c) >= 0.0 && r.getDouble(c) <= 1.0))
      }
    })
  }

  test("media dims are recoverable from the padded length (WAV invariant)") {
    // Pure-function property → full 100-case budget, no Spark job. The
    // WAV container stores only the frame count (= w·h, the padded
    // length), so decode recovers (w, h) iff dimsFor is a fixed point on
    // its own padded sizes: dimsFor(w·h) == (w, h).
    val p = Prop.forAll(Gen.choose(1, 1000000)) { n =>
      val (w, h) = graft.multimodal.Multimodal.dimsFor(n)
      w > 0 && h > 0 && w.toLong * h >= n &&
        graft.multimodal.Multimodal.dimsFor(w * h) == ((w, h))
    }
    val r = SCTest.check(SCTest.Parameters.default, p)
    assert(r.passed, r.status.toString)
  }

  test("hash buckets are total, in range, and split-consistent") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(30, Gen.choose(0L, 1000000L))) { ids =>
      val rows = ids.toDF("doc_id")
        .select(col("doc_id"),
          graft.pipeline.Curation.hashBucket(col("doc_id")).as("b"),
          graft.pipeline.Curation.splitOf(col("doc_id")).as("split"))
        .collect()
      rows.forall { r =>
        val (b, s) = (r.getInt(1), r.getString(2))
        b >= 0 && b < 100 &&
          s == (if (b < 80) "train" else if (b < 90) "val" else "test")
      }
    })
  }

  test("transition matrix: counts conserve pairs and probabilities sum to 1") {
    import spark.implicits._
    val evGen = Gen.listOfN(40, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 30L),
      Gen.oneOf("a", "b", "c")))
    check(Prop.forAll(evGen) { evs =>
      // distinct event_ids; ts collisions are exercised on purpose
      val df = evs.zipWithIndex.map { case ((u, ts, et), i) =>
        (u, i.toLong, et, ts)
      }.toDF("user_id", "event_id", "et", "ts_us")
      val rows = graft.operators.Transitions.eventTransitionsOf(df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
      val total = rows.map(_._3).sum
      // each user with n events contributes exactly n-1 transitions
      val perUser = evs.groupBy(_._1).view.mapValues(_.size).values
      val expect = perUser.map(n => math.max(0, n - 1)).sum
      val pSums = rows.groupBy(_._1).values
        .map(_.map(_._4).sum)
      total == expect && pSums.forall(s => math.abs(s - 1.0) < 1e-9)
    })
  }

  test("packing assignments tile each split without gaps or overlaps") {
    import spark.implicits._
    val docsG = Gen.listOfN(25, Gen.choose(0, 40))
    check(Prop.forAll(docsG) { lens =>
      val df = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val d = java.nio.file.Files.createTempDirectory("graft-packp").toString
      df.write.mode("overwrite").parquet(s"$d/documents.parquet")
      val rows = graft.pipeline.Curation.packAssignments(spark, d)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      rows.groupBy(_._2).values.forall { ds =>
        var cum = 0L
        ds.sortBy(_._1).forall { case (_, _, n, pid, off) =>
          val ok = pid == cum / 256 && off == cum % 256
          cum += n
          ok
        }
      }
    })
  }

  test("contamination is monotone in the benchmark set") {
    import spark.implicits._
    check(Prop.forAll(Gen.someOf(0L to 5L), docsGen) { (ids, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }
        .toDF("doc_id", "text")
      def flagged(bench: Seq[Long]): Set[Int] =
        graft.text.TextAnalysis.contaminationOf(df, bench)
          .filter(col("is_contaminated")).collect()
          .map(_.getInt(0)).toSet
      // a larger benchmark set can only flag MORE documents
      flagged(ids.toSeq).subsetOf(flagged((ids ++ Seq(0L, 1L)).distinct.toSeq))
    })
  }
}
