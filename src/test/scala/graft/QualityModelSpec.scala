package graft

import graft.text.QualityModel
import org.apache.spark.sql.DataFrame

/** Semantics of the learned quality model on inputs where the algebra is
  * independently checkable: the exact integer sums against BigInt
  * recomputation, the Cramer solve against the normal equations, and the
  * "did it actually learn" fact (R² > 0 vs the mean predictor) on the
  * real testdata corpus. The registry rows pin cross-engine bit-parity
  * against DuckDB; this pins that the mathematics is RIGHT, not merely
  * reproducible. */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "source", "text")

  test("normal-equation sums are the exact BigInt sums of the features") {
    val d = docs(
      (1L, "srcA", "the cat sat on the mat"),
      (2L, "srcA", "a b c d e f g h i j k l m n o p"),
      (3L, "srcB", "of mice and men and mountains"),
      (4L, "srcB", "x"))
      .select($"doc_id", $"text", $"source")
    val feats = QualityModel.featFrameOf(d)
      .collect().map(r => (BigInt(r.getLong(2)), BigInt(r.getLong(3)),
        BigInt(r.getLong(4))))
    val s = QualityModel.sumsOf(QualityModel.featFrameOf(d))
    assert(BigInt(s.n) === BigInt(feats.length))
    assert(BigInt(s.s1) === feats.map(_._1).sum)
    assert(BigInt(s.s2) === feats.map(_._2).sum)
    assert(s.s11 === feats.map(f => f._1 * f._1).sum)
    assert(s.s12 === feats.map(f => f._1 * f._2).sum)
    assert(s.s22 === feats.map(f => f._2 * f._2).sum)
    assert(BigInt(s.sy) === feats.map(_._3).sum)
    assert(s.s1y === feats.map(f => f._1 * f._3).sum)
    assert(s.s2y === feats.map(f => f._2 * f._3).sum)
    assert(s.syy === feats.map(f => f._3 * f._3).sum)
  }

  test("Cramer weights solve the normal equations (A·w = b) and match " +
    "the exact BigInt determinant") {
    val m = QualityModel.model(spark, dir)
    val s = m.sums
    // Exact determinant via BigInt — the double tree must agree to
    // rounding (each intermediate rounds once; the relative error bound
    // is a few ulps).
    def bd(x: Long) = BigInt(x)
    val exactDet =
      bd(s.n) * (s.s11 * s.s22 - s.s12 * s.s12) -
        bd(s.s1) * (bd(s.s1) * s.s22 - s.s12 * bd(s.s2)) +
        bd(s.s2) * (bd(s.s1) * s.s12 - s.s11 * bd(s.s2))
    assert(exactDet != 0, "degenerate corpus: features affinely dependent")
    assert(math.abs(m.det - exactDet.toDouble) <=
      1e-9 * math.abs(exactDet.toDouble))
    // The emitted det IS this exact integer, as a digit string (the r13
    // canonicalization fix), and detExactOf computes the same polynomial.
    assert(QualityModel.detExactOf(s) === exactDet)
    val rep = QualityModel.trainReportOfModel(spark, m).head()
    assert(rep.getString(10) === exactDet.toString)
    // Normal equations: A·w − b ≈ 0, relative to the b entries.
    val a = Array(
      Array(s.n.toDouble, s.s1.toDouble, s.s2.toDouble),
      Array(s.s1.toDouble, s.s11.toDouble, s.s12.toDouble),
      Array(s.s2.toDouble, s.s12.toDouble, s.s22.toDouble))
    val b = Array(s.sy.toDouble, s.s1y.toDouble, s.s2y.toDouble)
    val w = Array(m.w0, m.w1, m.w2)
    for (i <- 0 until 3) {
      val lhs = a(i)(0) * w(0) + a(i)(1) * w(1) + a(i)(2) * w(2)
      assert(math.abs(lhs - b(i)) <= 1e-6 * math.abs(b(i)),
        s"normal equation $i: $lhs vs ${b(i)}")
    }
  }

  test("the model actually learns: R² > 0 against the mean predictor") {
    val m = QualityModel.model(spark, dir)
    val s = m.sums
    val sse = QualityModel.scores(spark, dir)
      .select($"resid_micro").as[Double].collect()
      .map(r => r * r).sorted.sum
    // SST from the exact sums: Σ(y−ȳ)² = syy − sy²/n.
    val sst = s.syy.toDouble - s.sy.toDouble * s.sy.toDouble / s.n.toDouble
    assert(sst > 0)
    val r2 = 1.0 - sse / sst
    assert(r2 > 0.0, s"model no better than the mean: R²=$r2")
  }

  test("eval partitions every document into exactly one confusion cell") {
    val rows = QualityModel.evalReport(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tp, fp, fn, tn) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(tp + fp + fn + tn === n)
      val agree = r.getDouble(6)
      assert(agree >= 0.0 && agree <= 1.0)
      assert(agree === (tp + tn).toDouble / n.toDouble)
      assert(r.getDouble(7) >= 0.0) // mse
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total === QualityModel.scores(spark, dir).count())
  }

  test("split-honest eval: fit on the train split, scored docs are exactly the val split") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
    val split = graft.pipeline.Curation.splitOf(col("doc_id"))
    val nTrain = docs.filter(split === "train").count()
    val nVal = docs.filter(split === "val").count()
    assert(nTrain > 0 && nVal > 0)
    // the fitted state saw ONLY the train split
    assert(QualityModel.modelTrainSplit(spark, dir).sums.n === nTrain)
    // the confusion matrix covers EXACTLY the val split, partitioned
    val rows = QualityModel.evalReportVal(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum === nVal)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        === r.getLong(1))
    }
  }

  test("scores carry the literal-weight prediction tree exactly") {
    val m = QualityModel.model(spark, dir)
    val r = QualityModel.scores(spark, dir).orderBy($"doc_id").head()
    val (x1, x2) = (r.getLong(1), r.getLong(2))
    val expected = m.w0 + m.w1 * x1.toDouble + m.w2 * x2.toDouble
    assert(r.getDouble(4) === expected) // bit-exact: same ops, same literals
    assert(r.getDouble(5) === r.getLong(3).toDouble - expected)
  }

  test("the trained model is memoized index-class state (one build per dir)") {
    val a = QualityModel.model(spark, dir)
    val b = QualityModel.model(spark, dir)
    assert(a eq b)
  }

  test("y6 IS the judge: micro-units of TextAnalysis.qualityScore, row-for-row") {
    // ADVICE r12: featFrameOf used to re-implement the judge's formula;
    // a drift in one copy would have silently invalidated the
    // gate-agreement eval. Now both read one shared Column tree — this
    // pins the contract (y6 == round(quality·10⁶)) on the real corpus.
    val y = QualityModel.featFrameOf(Tables.load(spark, dir, "documents"))
      .select($"doc_id", $"y6")
    val q = graft.text.TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id",
        org.apache.spark.sql.functions.round(
          $"quality" * 1000000.0).cast("long").as("q6"))
    val joined = y.join(q, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter($"y6" =!= $"q6").count() === 0L)
  }

  test("past the Int64 envelope: decimal sums exact where the long path throws") {
    // 10⁷ docs at y6 = 10⁶ → Σy6² = 10¹⁹ > Long.MaxValue (9.2·10¹⁸):
    // the r12 envelope, crossed. The retired Int64 path must fail LOUD
    // under ANSI (never wrap); the decimal(38,0) path must be exact.
    val n = 10000000L
    val feats = spark.range(n).select(
      $"id".as("doc_id"), org.apache.spark.sql.functions.lit("syn").as("source"),
      ($"id" % 1000L + 1L).as("x1"), ($"id" % 97L + 1L).as("x2"),
      org.apache.spark.sql.functions.lit(1000000L).as("y6"))
    val e = intercept[Throwable](QualityModel.sumsOfInt64(feats))
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(
      _.toUpperCase(java.util.Locale.ROOT).contains("OVERFLOW"))),
      s"expected a loud ANSI overflow, got: $e")
    val s = QualityModel.sumsOf(feats)
    assert(s.syy === BigInt(n) * BigInt(1000000L) * BigInt(1000000L))
    assert(s.syy > BigInt(Long.MaxValue))
    val m = QualityModel.modelOf(s)
    assert(!m.det.isNaN && !m.w1.isNaN && !m.w2.isNaN)
    // the train report carries the exact wide state end-to-end, as
    // digit strings (decimal emission was the r13 driver-hash trap)
    val rep = QualityModel.trainReportOfModel(spark, m).head()
    assert(BigInt(rep.getString(9)) === s.syy)
  }
}
