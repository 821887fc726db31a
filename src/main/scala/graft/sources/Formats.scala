package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables

/** Source-format tier (SURVEY §2.1): the engine's tables are
  * parquet-canonical (Tables.load), but ingest at the edges arrives as
  * CSV / JSON-lines. Readers take EXPLICIT schemas — schema inference is
  * a full extra pass over the data, an anti-pattern at 100 TB — and keep
  * the S2 graceful-empty posture for missing paths. Fidelity is proven by
  * the `source_roundtrip_counts` registry row: events → CSV and JSONL →
  * read back → exact-cents aggregate must hash-match the oracle computed
  * from the parquet original (doubles survive because Spark writes
  * shortest-round-trip decimal text).
  */
object Formats {

  /** Round-trip scratch paths: per-input content tag + per-JVM nonce via
    * [[graft.Scratch]] (shared cleanup + stale-dir GC; a per-input-only
    * path races across PROCESSES — the graft-ivf lesson). */
  private def scratchDir(prefix: String, dir: String): String =
    graft.Scratch.dir(prefix,
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(12))

  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    if (!new java.io.File(path).exists())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).option("header", "true").csv(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    if (!new java.io.File(path).exists())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(path)

  /** Round-trip the events table through both text formats and aggregate
    * each side identically (counts + exact-cents value sums). Timestamps
    * travel as epoch-micros longs — the engine-portable convention
    * (EventStreams) — so text formats can't lose sub-second precision. */
  def roundTripCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    // Overwrite mode: repeated runs in this JVM rewrite in place;
    // concurrent JVMs never collide; Scratch reclaims the dirs.
    val base = scratchDir("graft-fmt", dir)
    ev.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    ev.write.mode("overwrite").json(s"$base/jsonl")
    def aggOf(df: DataFrame, fmt: String): DataFrame =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(graft.operators.Relational.cents(col("value"))) / lit(100.0))
            .as("sum_value"))
        .select(lit(fmt).as("fmt"), col("event_type"), col("n"),
          col("sum_value"))
    aggOf(readCsv(spark, s"$base/csv", ev.schema), "csv")
      .unionByName(aggOf(readJsonl(spark, s"$base/jsonl", ev.schema), "jsonl"))
      .orderBy("fmt", "event_type")
  }

  /** PERMISSIVE JSONL read: malformed records land whole in
    * `_corrupt_record` instead of killing the scan — the S2 posture at
    * ROW granularity (at 100 TB corrupt lines are data to account for,
    * not exceptions to die on). */
  def readJsonlTolerant(spark: SparkSession, path: String,
                        schema: StructType): DataFrame = {
    val withCorrupt = schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Corrupt-tolerant ingest, oracle-exactly: write the events as JSONL
    * with every 97th event_id deterministically mangled (a non-JSON
    * prefix), read back PERMISSIVE, and account good vs corrupt rows +
    * the exact-cents sum of the good ones. The oracle never sees the
    * file — it predicts the same numbers from the corruption RULE over
    * the parquet original, so a reader that drops, duplicates, or
    * mis-buckets any row hash-fails. */
  def tolerantJsonlCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    val base = scratchDir("graft-fmt-tol", dir)
    val line = to_json(struct(ev.columns.map(col): _*))
    ev.select(
        when(col("event_id") % 97 === 0, concat(lit("NOTJSON"), line))
          .otherwise(line).as("value"))
      .write.mode("overwrite").text(base)
    val schema = StructType(ev.schema.fields.toIndexedSeq)
    val read = readJsonlTolerant(spark, base, schema)
    read.agg(
      count(lit(1)).as("n_total"),
      count(col("_corrupt_record")).as("n_corrupt"),
      count(col("event_id")).as("n_good"),
      (sum(graft.operators.Relational.cents(col("value"))) / lit(100.0))
        .as("sum_value_good"))
  }
}
