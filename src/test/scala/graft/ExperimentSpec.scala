package graft

import graft.operators.Experiment

/** The A/B conversion report's statistical invariants — the oracle pins
  * cross-engine bits; this pins that the numbers mean what they claim. */
class ExperimentSpec extends SparkTestBase {
  test("a/b report: margins populated, rates in range, chi2 consistent") {
    val r = Experiment.abConversionReport(spark, "/root/testdata/sf0.001")
      .head()
    val (nA, convA, nB, convB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (rateA, rateB, chi2) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(nA > 0 && nB > 0)
    assert(convA >= 0 && convA <= nA && convB >= 0 && convB <= nB)
    // non-degenerate at the pinned threshold: both margins populated
    assert(convA + convB > 0 && (nA - convA) + (nB - convB) > 0)
    assert(rateA == convA.toDouble / nA && rateB == convB.toDouble / nB)
    // chi2 recomputed independently (plain scala, same contingency)
    val (a, b, c, d) =
      (convA.toDouble, (nA - convA).toDouble,
        convB.toDouble, (nB - convB).toDouble)
    val expected = (a + b + c + d) * math.pow(a * d - b * c, 2) /
      ((a + b) * (c + d) * (a + c) * (b + d))
    assert(math.abs(chi2 - expected) < 1e-9 * math.max(1.0, expected),
      s"chi2 $chi2 vs recomputed $expected")
    assert(chi2 >= 0)
  }
}
