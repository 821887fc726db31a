package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Pruning
import graft.sources.ZOrderLayout

/** The scan-reduction tier: bloom-pruned joins and the Z-order layout.
  * Both must be answer-invisible (pruning never changes a result) and
  * actually prune (fewer exchanged bytes / fewer files read) — the second
  * half is what distinguishes the operator from a no-op that merely
  * passes its oracle. */
class PruningSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** Bench-style shuffle accounting: sum of shuffleBytesWritten over the
    * executed plan's exchanges (AQE stages traversed). The frame must
    * have been materialized through its OWN QueryExecution (collect). */
  private def shuffleBytes(df: DataFrame): Long = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(s.plan)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L) +
          e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Files actually opened by the executed plan's parquet scans
    * (partition pruning happens at planning; "numFiles" is the
    * post-pruning count). */
  private def filesRead(df: DataFrame): Long = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics.get("numFiles").map(_.value).getOrElse(0L)
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bloom-pruned join is row-identical to the plain join") {
    val pruned = Pruning.bloomPrunedBrandVolume(spark, dir).collect()
    val plain = Pruning.plainBrandVolume(spark, dir).collect()
    assert(pruned.nonEmpty)
    assert(pruned.toSeq == plain.toSeq)
  }

  test("bloom probe is a superset filter with a bounded false-positive rate") {
    GraftFunctions.register(spark)
    val bytes = Pruning.dimBloomBytes(spark, dir)
    val li = Tables.load(spark, dir, "lineitem").select("l_partkey")
    val dimKeys = Tables.load(spark, dir, "part")
      .filter(col("p_size") <= Pruning.SizeCap).select("p_partkey")
    // Every true member passes (a bloom has no false negatives):
    // value-level except avoids the self-join attribute ambiguity.
    val survivors = li
      .filter(GraftFunctions.bloomMightContain(bytes, col("l_partkey")))
      .distinct()
    val trueMatches = li.join(dimKeys,
      li("l_partkey") === dimKeys("p_partkey"), "left_semi").distinct()
    assert(trueMatches.except(survivors).isEmpty)
    // Observed FP rate over NON-member distinct keys ≤ ~3× the sized fpp
    // (sketch sizing is probabilistic; 3× absorbs its variance).
    val nonMembers = li.distinct().join(dimKeys,
      li("l_partkey") === dimKeys("p_partkey"), "left_anti")
    val nNon = nonMembers.count()
    val nFp = nonMembers
      .filter(GraftFunctions.bloomMightContain(bytes, col("l_partkey")))
      .count()
    assert(nNon > 0)
    assert(nFp.toDouble / nNon <= 3 * Pruning.Fpp,
      s"observed fpp ${nFp.toDouble / nNon} vs sized ${Pruning.Fpp}")
  }

  test("bloom prune cuts the fact side's exchanged bytes") {
    val pruned = Pruning.bloomPrunedBrandVolume(spark, dir)
    val plain = Pruning.plainBrandVolume(spark, dir)
    pruned.collect(); plain.collect()
    val (bPruned, bPlain) = (shuffleBytes(pruned), shuffleBytes(plain))
    // ~10% of parts match p_size <= SizeCap, so the pruned fact exchange
    // carries roughly a tenth of the rows; assert the direction with
    // headroom (dictionary-encoded shuffle files compress unevenly).
    assert(bPlain > 0, "plain plan must shuffle (merge hint)")
    assert(bPruned < bPlain / 2,
      s"pruned exchange $bPruned bytes vs plain $bPlain")
  }

  test("over-budget dim slice disables the bloom: plain plan, parity green") {
    // Budget 0 forces every slice over budget — the 100 TB degradation
    // path (a ~50M-key slice whose sketch is no longer broadcast-cheap),
    // exercised at bench SF. The gated plan must contain NO bloom probe
    // (it IS the plain join) and must stay row-identical.
    val gated = Pruning.bloomPrunedBrandVolumeWithBudget(spark, dir, 0L)
    assert(!gated.queryExecution.analyzed.toString
      .toLowerCase(java.util.Locale.ROOT).contains("bloom"),
      "over-budget plan must not carry a bloom probe")
    val rows = gated.collect()
    val plain = Pruning.plainBrandVolume(spark, dir).collect()
    assert(rows.nonEmpty && rows.toSeq == plain.toSeq)
    // and the under-budget path is still the pruned plan
    val pruned = Pruning.bloomPrunedBrandVolume(spark, dir)
    assert(pruned.queryExecution.analyzed.toString
      .toLowerCase(java.util.Locale.ROOT).contains("bloom"))
  }

  test("null join keys are dropped by the probe, matching join semantics") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bytes = Pruning.dimBloomBytes(spark, dir)
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
    // NULL key → NULL probe → filtered out, exactly as the exact join
    // would drop it; the expression must not resurrect or crash on it.
    val kept = df.filter(GraftFunctions.bloomMightContain(bytes, $"k"))
      .collect().map(_.get(0))
    assert(!kept.contains(null))
  }

  test("morton bijects the grid and bin hits its bounds") {
    val g = 1 << ZOrderLayout.G
    val codes = for { x <- 0L until g; y <- 0L until g }
      yield ZOrderLayout.morton(x, y)
    assert(codes.distinct.size == g * g)
    assert(codes.min == 0L && codes.max == g.toLong * g - 1)
    assert(ZOrderLayout.bin(100L, 100L, 999L) == 0L)
    assert(ZOrderLayout.bin(999L, 100L, 999L) == g - 1L)
  }

  test("a box disjoint from the data bounds yields only the null bin") {
    val b = ZOrderLayout.ZBounds(
      ZOrderLayout.CustHi + 1000, ZOrderLayout.CustHi + 2000, 0, 10)
    assert(ZOrderLayout.candidateBins(b) == Seq(-1L))
    assert(ZOrderLayout.candidateRanges(b) == Seq(-1L -> -1L))
  }

  test("z-range decomposition covers exactly the box's cell set (G=3 and G=8)") {
    // The quadtree decomposition must equal brute-force enumeration —
    // the closed-form claim the manifest form's scale story rests on.
    for ((g, bxLo, bxHi, byLo, byHi) <- Seq(
      (3, 1L, 5L, 2L, 6L), (3, 0L, 7L, 0L, 7L), (3, 4L, 4L, 0L, 0L),
      (8, 17L, 130L, 63L, 200L), (8, 0L, 255L, 128L, 128L),
      (8, 250L, 255L, 250L, 255L))) {
      val ranges = ZOrderLayout.zRangesG(g, bxLo, bxHi, byLo, byHi)
      val covered = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
      val expected = (for {
        x <- bxLo to bxHi; y <- byLo to byHi
      } yield ZOrderLayout.mortonG(g, x, y)).toSet
      assert(covered == expected, s"g=$g box=($bxLo..$bxHi,$byLo..$byHi)")
      // ranges sorted, disjoint, merged
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2)
        case _ =>
      }
      // the scale property: never a per-cell enumeration
      assert(ranges.size <= expected.size)
    }
    assert(ZOrderLayout.zRangesG(8, 5L, 4L, 0L, 1L).isEmpty)
  }

  test("manifest-pruned z-scan: row-identical, reads a file subset") {
    val manifest = ZOrderLayout.zScanManifest(spark, dir)
    val got = manifest.collect()
    val plain = ZOrderLayout.zScan(spark, dir).collect()
    assert(got.nonEmpty && got.toSeq == plain.toSeq)
    manifest.collect() // materialize through its own QueryExecution
    val read = filesRead(manifest)
    val (total, kept, ranges) =
      ZOrderLayout.manifestPruneStats(spark, dir)
    assert(read == kept, s"scan read $read files, manifest kept $kept")
    assert(kept < total / 2,
      s"manifest must prune: kept $kept of $total files ($ranges ranges)")
  }

  test("candidate ranges cover exactly the candidate cell set") {
    val b = ZOrderLayout.ZBounds(0, 1499, 9000, 11000)
    val cells = ZOrderLayout.candidateBins(b).toSet
    val ranges = ZOrderLayout.candidateRanges(b)
    val covered = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(covered == cells)
    // merged: strictly fewer predicates than cells (the scale argument)
    assert(ranges.size < cells.size)
    // ranges are disjoint and sorted
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2 || h1 < l2)
      case _ =>
    }
  }

  test("z-scan is row-identical to the plain box query") {
    val viaLayout = ZOrderLayout.zScan(spark, dir).collect()
    val plain = {
      val o = Tables.load(spark, dir, "orders")
      o.filter(col("o_custkey")
          .between(ZOrderLayout.CustLo, ZOrderLayout.CustHi) &&
          expr(s"unix_micros(cast(o_orderdate as timestamp)) div ${ZOrderLayout.DayUs}")
            .between(ZOrderLayout.DayLo, ZOrderLayout.DayHi))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
        .orderBy("o_orderpriority")
        .collect()
    }
    assert(viaLayout.nonEmpty)
    assert(viaLayout.toSeq == plain.toSeq)
  }

  test("partition pruning actually skips non-candidate files") {
    val (lay, b) = ZOrderLayout.layout(spark, dir)
    val candidates = ZOrderLayout.candidateBins(b)
    val full = lay.groupBy().count()
    val pruned = lay.filter(col("zbin").isin(candidates: _*)).groupBy().count()
    full.collect(); pruned.collect()
    val (fAll, fPruned) = (filesRead(full), filesRead(pruned))
    // One file per occupied bin (repartition(zbin) before partitionBy);
    // the pruned scan must open exactly the EXISTING candidate dirs —
    // strictly fewer than the layout's full file census.
    assert(fAll > 0)
    assert(fPruned < fAll, s"pruned scan read $fPruned of $fAll files")
    assert(fPruned <= candidates.size.toLong,
      s"pruned scan read $fPruned files for ${candidates.size} candidates")
  }

  test("the report's accounting invariants hold") {
    val r = ZOrderLayout.zReport(spark, dir).head()
    val (total, cand, hit, rows) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(total <= (1L << (2 * ZOrderLayout.G)))
    assert(hit <= cand, s"hit $hit must be within the candidate set $cand")
    assert(cand <= total, "candidates exceed occupied bins at this SF")
    assert(rows > 0, "the pinned box must match rows at every SF")
  }
}
