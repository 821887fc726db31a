package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact global ranking — the building block that replaces
  * no-partition window functions (`ntile`/`row_number`/`percent_rank`
  * over a whole table), which funnel every row through ONE task.
  *
  * The shape is the classic distributed zipWithIndex: range-repartition
  * on the sort keys, sort within partitions, then ONE shuffle feeds two
  * jobs over the SAME RDD — a per-partition count pass and the position
  * pass that adds the cumulative offsets. Sharing the RDD is what makes
  * this exact: the range sampler's bounds are drawn once and the shuffle
  * files written once, so the counts and the rows cannot disagree.
  * (The previous formulation joined a separately-computed offsets
  * branch; Catalyst planned that as TWO physical range exchanges whose
  * independently-sampled bounds could differ, silently shifting
  * positions at partition boundaries — caught by the sf0.01 oracle.)
  *
  * Positions are exact whatever bounds the sampler picks, because the
  * offsets come from the actual per-partition counts of the very
  * shuffle the rows are read from. No task ever holds more than one
  * range partition; the count pass is a streamed `it.size` per
  * partition. The `Row` hop costs one encode/decode per row — the
  * price of exactness; rank-hungry callers run it once per query.
  */
object Ranks {

  /** Appends `posName` = exact 1-based position of each row in the
    * total order given by `sortCols` (callers must include a unique
    * tiebreak column), and `__n` = total row count. */
  private[graft] def withGlobalPos(df: DataFrame, sortCols: Seq[Column],
                                   posName: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df.drop("__n")
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd // ONE lineage: shuffle written once, read twice
    val counts = rdd.mapPartitions(
      it => Iterator.single(it.size.toLong), preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val withPos = rdd.mapPartitionsWithIndex({ (pid, it) =>
      var i = offsets(pid)
      it.map { row => i += 1L; Row.fromSeq(row.toSeq :+ i) }
    }, preservesPartitioning = true)
    spark.createDataFrame(withPos,
        sorted.schema.add(posName, LongType, nullable = false))
      .withColumn("__n", lit(total))
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
