package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Declarative bloom-filter semi-join pruning (the scan-reduction tier's
  * join-side member, next to Skew's salted shuffles).
  *
  * Shape: a selective dimension slice (`part WHERE p_size <= 5`, ~10% of
  * parts) joins a fact relation (`lineitem`) that is 100 TB-class in the
  * target deployment. A plain shuffle join exchanges EVERY fact row on the
  * join key and discards ~90% of them at the probe; the pruned plan builds
  * one bloom over the dim slice's keys (tree-aggregated sketch — shipped
  * size is the bit array, bounded by expectedNumItems·fpp, never the
  * rows), embeds it as a literal, and filters the fact side inside the
  * scan's codegen stage BEFORE the exchange. At bench SF the measured win
  * is the fact exchange's bytes (~10× fewer rows shuffled); at 100 TB that
  * exchange IS the bottleneck. Spark's own InjectRuntimeFilter makes the
  * same move but only above a 10 GB application-side scan threshold; this
  * is the declarative twin that keeps the plan testable at bench SF (the
  * Skew-tier relationship to AQE's skew-join split).
  *
  * Correctness never depends on the sketch: false positives pass the probe
  * and die in the exact join that follows — the oracle is the PLAIN join
  * (`DedupRegistry`-style discipline: pruning must never change an
  * answer). The dim side carries the same `merge` hint as the salted join
  * and for the same reason: at toy SF Catalyst would (correctly) broadcast
  * the dim and the pruned exchange would never execute; at the scale where
  * bloom pruning matters the dim no longer broadcasts.
  *
  * Sizing at 100 TB: the bloom is built over the DIM SLICE, not the fact —
  * 1 M keys at 1% fpp is ~1.2 MB, 10 M is ~12 MB; past ~50 M keys the
  * sketch stops being broadcast-cheap and the right tool becomes a shuffle
  * semi-join again (or a partition-level zone map — ZOrderLayout). The
  * builder counts the slice first and sizes the sketch exactly, so fpp is
  * honest rather than degrading silently as the slice grows.
  */
object Pruning {

  /** Dim-slice predicate: p_size <= SizeCap keeps ~10% of parts. */
  val SizeCap = 5

  /** False-positive rate the sketch is sized for (observed rate is
    * asserted ≤ ~3× this in PruningSpec — sketch sizing is probabilistic,
    * the bound is not exact). */
  val Fpp = 0.01

  private def dimSlice(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .filter(col("p_size") <= SizeCap)
      .select(col("p_partkey"), col("p_brand"))

  /** Key-count budget past which the sketch stops being broadcast-cheap
    * (the scaladoc's own sizing: ~50 M keys at 1% fpp is ~60 MB — no
    * longer a literal you want in every task's closure) and the right
    * tool becomes the plain shuffle semi-join again. The gate is checked
    * against the exact `keys.count()` the sizing pass already pays, so
    * degradation is a code path, not a doc footnote. */
  val BloomKeyBudget = 50000000L

  /** Serialized bloom over the dim slice's keys, built once per
    * (JVM, dir): two jobs over the small dim (an exact count to size the
    * sketch, then the tree-aggregated build). None when the slice exceeds
    * `budget` — the caller must fall back to the un-pruned plan. */
  private[graft] def dimBloomBytesIfCheap(
      spark: SparkSession, dir: String,
      budget: Long = BloomKeyBudget): Option[Array[Byte]] =
    graft.Memo.get(spark, "bloom-dim-keys", (dir, SizeCap, Fpp, budget)) {
      val keys = dimSlice(spark, dir).select("p_partkey")
      val n = math.max(64L, keys.count())
      if (n > budget) None
      else {
        val bf = keys.stat.bloomFilter("p_partkey", n, Fpp)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        Some(bos.toByteArray)
      }
    }

  /** Bench-prewarm entry (ingest-side build; throws if over budget —
    * at bench SF the slice is always under it). */
  def dimBloomBytes(spark: SparkSession, dir: String): Array[Byte] =
    dimBloomBytesIfCheap(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"dim slice exceeds BloomKeyBudget=$BloomKeyBudget; " +
          "bloom pruning is disabled at this scale"))

  /** Brand volume through the bloom-pruned join. Result is identical to
    * the plain join (the oracle); only the exchanged bytes differ. When
    * the dim slice exceeds the key budget the bloom is NOT built and the
    * plan IS the plain join — the documented degradation, as code. */
  def bloomPrunedBrandVolume(spark: SparkSession, dir: String): DataFrame =
    bloomPrunedBrandVolumeWithBudget(spark, dir, BloomKeyBudget)

  private[graft] def bloomPrunedBrandVolumeWithBudget(
      spark: SparkSession, dir: String, budget: Long): DataFrame =
    dimBloomBytesIfCheap(spark, dir, budget) match {
      case None => plainBrandVolume(spark, dir)
      case Some(bytes) =>
        GraftFunctions.register(spark)
        val fact = Tables.load(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_extendedprice"))
          .filter(GraftFunctions.bloomMightContain(bytes, col("l_partkey")))
        val dim = dimSlice(spark, dir).hint("merge")
        fact.join(dim, fact("l_partkey") === dim("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_c"))
          .orderBy("p_brand")
    }

  /** The same plan WITHOUT the bloom probe — PruningSpec's parity +
    * exchanged-bytes A/B baseline (not a registry row). */
  private[graft] def plainBrandVolume(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"))
    val dim = dimSlice(spark, dir).hint("merge")
    fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_c"))
      .orderBy("p_brand")
  }
}
