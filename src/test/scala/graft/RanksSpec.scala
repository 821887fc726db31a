package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** The distributed-rank primitive behind rfm_features and
  * text_quality_percentiles: exact global positions from range
  * partitioning + the closed-form ntile, property-checked against
  * Spark's own (single-partition) window functions on data small
  * enough that the reference window is safe. */
class RanksSpec extends SparkTestBase {

  private def randomDf(n: Int, seed: Long) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    // Duplicate-heavy key column: ties must be broken by id.
    (0 until n).map(i => (i.toLong, rng.nextInt(7), rng.nextDouble()))
      .toDF("id", "key", "noise")
  }

  test("withGlobalPos equals the single-partition row_number, asc and desc") {
    val df = randomDf(500, seed = 1)
    for (keys <- Seq(
      Seq(col("key").asc, col("id").asc),
      Seq(col("key").desc, col("id").asc),
      Seq(col("noise").asc, col("id").asc))) {
      val got = Ranks.withGlobalPos(df, keys, "pos")
        .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val want = df.withColumn("pos",
          row_number().over(Window.orderBy(keys: _*)).cast("long"))
        .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"keys=$keys")
    }
  }

  test("withGlobalPos is exact when rows outnumber partitions unevenly") {
    // 101 rows over 32 shuffle partitions: empty and uneven ranges.
    val df = randomDf(101, seed = 2)
    val got = Ranks.withGlobalPos(df, Seq(col("id").asc), "pos")
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sortBy(_._1).map(_._2).toSeq == (1L to 101L))
  }

  test("withGlobalPos is exact past the range sampler's exact window") {
    // Above ~sampleSizePerPartition·parts rows the range bounds come
    // from a RANDOM sample. The r7 regression: a separately-planned
    // offsets branch re-sampled different bounds and shifted positions
    // at partition boundaries — only visible at this size. One RDD
    // lineage now feeds both passes, so positions stay exact; three
    // repetitions guard against sampling luck.
    val df = randomDf(20000, seed = 3)
    val keys = Seq(col("noise").desc, col("id").asc)
    val want = df.withColumn("pos",
        row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (rep <- 1 to 3) {
      val got = Ranks.withGlobalPos(df, keys, "pos")
        .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"rep=$rep")
    }
  }

  test("ntileBucket matches Spark's ntile across sizes and bucket counts") {
    for (n <- Seq(5, 20, 97, 500); k <- Seq(2, 5, 7)) {
      val df = randomDf(n, seed = n * 31L + k)
      val keys = Seq(col("key").asc, col("id").asc)
      val got = Ranks.withGlobalPos(df, keys, "pos")
        .select(col("id"), Ranks.ntileBucket("pos", k).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.select(col("id"),
          ntile(k).over(Window.orderBy(keys: _*)).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }
}
