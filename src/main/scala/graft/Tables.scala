package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.util.{Failure, Success, Try}

/** Parquet table readers over the driver testdata (SURVEY.md §2.1 S1/S2).
  *
  * The reference extracts six Postgres tables with plain `SELECT`s
  * (reference `app/etl.py:141-164`); here each table is a parquet scan whose
  * projection/predicates Catalyst pushes into the file reader, so the
  * "extract" step dissolves into the query plans themselves. At 100 TB the
  * same call reads a partitioned parquet/table layout — no code change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has shipped `ts` as TIMESTAMP(NANOS) (which Spark's
    // parquet reader rejects — read nanos as long, truncate to micros with
    // integer division; the ns epoch exceeds 2^53 so double math would
    // corrupt it) and as un-annotated micros (which Spark reads as
    // TIMESTAMP_NTZ). Normalize both to Spark's native instant TIMESTAMP —
    // the session TZ is pinned UTC, so the NTZ→instant cast is
    // value-preserving and downstream epoch math (`unix_micros`, windowed
    // streaming) keeps one code path regardless of the file's physical type.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Read un-annotated micros as instant TIMESTAMP at the SCAN, not
      // as NTZ + a per-row cast: under the pinned UTC session the two
      // are value-identical, but the cast wrapped every `ts` reference
      // in an expression that blocked parquet predicate pushdown on the
      // events time axis and paid per-row work on every scan (r7:
      // hourly_count_anomalies 0.44→2.45 s, incremental_agg_merge
      // 0.36→1.48 s — both recovered by this). normalizeTs stays as
      // the fallback for the NANOS→long encoding, where arithmetic is
      // genuinely required.
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The one place both physical `ts` encodings normalize to Spark's
    * instant TIMESTAMP — shared by the batch reader above and the
    * streaming file source (EventStreams.eventStream), so a new driver
    * encoding is handled once, never per-path. */
  def normalizeTs(df: DataFrame): DataFrame = {
    // The NTZ→instant cast below is value-preserving ONLY under a UTC
    // session zone. Every entry point pins it, but correctness must not
    // depend on each main() remembering — pin it here too (idempotent),
    // so a future entry point that forgets cannot silently shift every
    // event timestamp by the host offset.
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** S2: error-tolerant scan (reference `app/etl.py:132-139` `safe_fetch`
    * returns `[]` on failure). Missing/corrupt source → empty DataFrame of
    * the given schema, with a logged warning — the query keeps running.
    */
  def loadSafe(spark: SparkSession, dir: String, name: String,
               schema: StructType): DataFrame =
    Try(spark.read.schema(schema).parquet(s"$dir/$name.parquet")) match {
      case Success(df) => df
      case Failure(e) =>
        System.err.println(s"[graft] source $name unavailable, " +
          s"substituting empty relation: ${e.getMessage}")
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** S7: liveness smoke (reference `SELECT 1` / `RETURN 1`,
    * `app/etl.py:46-47,65`). */
  def healthProbe(spark: SparkSession): DataFrame =
    spark.range(1).toDF("ok")

  /** Round-robin spread for CPU-heavy derivations over unsplittable
    * inputs. A single-row-group parquet file hands the WHOLE scan to one
    * task, and whole-stage codegen then fuses every narrow step —
    * tokenize, hash, explode, partial aggregation — into that one task:
    * a 32-core host runs the entire map side serially (measured 3-10× on
    * the co-purchase and SimHash families when the testdata arrived
    * re-encoded as one row group per table). The explicit partition
    * count keeps AQE from coalescing the spread away; the gate keeps
    * this a no-op precisely when it would hurt — at warehouse scale the
    * source arrives as many files/row-groups, the scan already has ≥
    * parallelism partitions, and no extra shuffle is added.
    *
    * PRECONDITION: call this on scan-level frames only (a scan plus
    * narrow projections/filters). The gate reads df.rdd.getNumPartitions,
    * and under AQE that finalizes the physical plan — on a frame with
    * upstream exchanges it would execute those shuffle stages just to
    * count partitions, and the real action would then re-run them
    * (exchange reuse does not span separate actions). */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
