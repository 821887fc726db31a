package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — the building block that replaces
  * no-partition window functions (`ntile`/`row_number`/`percent_rank`
  * over a whole table), which funnel every row through ONE task.
  *
  * The shape is the classic distributed zipWithIndex: range-repartition
  * on the sort keys, rank within each partition, and add per-partition
  * cumulative offsets. The offsets come from a histogram with one row
  * per shuffle partition, so the only single-partition window in the
  * plan runs over ≤ `spark.sql.shuffle.partitions` rows — never the
  * data. Positions are exact whatever bounds the range sampler picks,
  * because offsets are computed from the ACTUAL per-partition counts
  * inside the same plan (the exchange is reused, not re-executed).
  */
object Ranks {

  /** Appends `posName` = exact 1-based position of each row in the
    * total order given by `sortCols` (callers must include a unique
    * tiebreak column), and `__n` = total row count. */
  private[graft] def withGlobalPos(df: DataFrame, sortCols: Seq[Column],
                                   posName: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.drop("__n")
      .repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val cum = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(cum), lit(0L)))
      .withColumn("__n", sum("__cnt").over(whole))
      .drop("__cnt")
    val within = Window.partitionBy("__pid").orderBy(sortCols: _*)
    parted.join(broadcast(offs), "__pid")
      .withColumn(posName, col("__off") + row_number().over(within))
      .drop("__pid", "__off")
  }

  /** ntile(k) bucket from a global position — the closed form of the
    * SQL-standard assignment (first n%k buckets hold ⌈n/k⌉ rows, the
    * rest ⌊n/k⌋), identical to Spark's and DuckDB's `ntile`. All
    * arithmetic integral (`div`/`%`); the zero-size else branch is
    * unreachable when n ≥ k and CASE evaluates lazily. */
  private[graft] def ntileBucket(pos: String, k: Int): Column = {
    val size = s"(__n div $k)"
    val rem = s"(__n % $k)"
    val cut = s"($rem * ($size + 1))"
    expr(s"CAST(CASE WHEN $pos <= $cut " +
      s"THEN (($pos - 1) div ($size + 1)) + 1 " +
      s"ELSE $rem + (($pos - $cut - 1) div $size) + 1 END AS INT)")
  }
}
