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

  /** DECLARED SCHEMA-DRIFT POSTURE for parquet sources (S2 at FILE
    * granularity — the likelier 100 TB incident than a wholly absent
    * table): reads go through an EXPLICIT canonical schema, under which
    * Spark's parquet reader resolves per-file drift as
    *  - missing optional column → null-filled (rows survive, accounted);
    *  - compatible numeric widening in the file (e.g. int32 where the
    *    canonical type is int64) → upcast at the scan, values exact;
    *  - incompatible physical type (e.g. string where int64 expected) →
    *    the scan fails LOUDLY (FAILED_READ_FILE.PARQUET_COLUMN_DATA_
    *    TYPE_MISMATCH) — silent coercion of incompatible data is never
    *    the right default for a training corpus.
    * All three arms are pinned in FormatsSpec; the drifted-but-readable
    * arms are additionally oracle-checked end-to-end by
    * [[schemaDriftReport]]. */
  def readParquetDeclared(spark: SparkSession, schema: StructType,
                          paths: String*): DataFrame =
    spark.read.schema(schema).parquet(paths: _*)

  /** Audit + read-back row for the drift posture, oracle-exactly (the
    * tolerantJsonlCounts pattern): construct a three-file layout from
    * the orders table in per-JVM scratch — one canonical file, one
    * missing `o_totalprice`, one with `o_custkey` narrowed to int32
    * (modulo 1e6 first, so the narrowing is value-preserving at every
    * scale slice — raw keys pass 2³¹ at 10×) — then (a) classify every
    * file's FOOTER against the canonical schema on the executors
    * (metadata-only reads, the audit cost model a 100k-file table
    * needs), and (b) read the layout back through the declared posture
    * and account rows, null-fills, and exact-cents sums. The oracle
    * never sees the files: it predicts every number from the slicing
    * rule over the parquet original. */
  def schemaDriftReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val base = scratchDir("graft-drift", dir)
    // coalesce(1): exactly one file per slice, so the file-class counts
    // are scale-independent constants the oracle can state.
    orders.filter(col("o_orderkey") % 3 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/s0")
    orders.filter(col("o_orderkey") % 3 === 1).drop("o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/s1")
    orders.filter(col("o_orderkey") % 3 === 2)
      .withColumn("o_custkey", (col("o_custkey") % 1000000L).cast("int"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/s2")
    val canonical = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType)))
    // (a) footer audit, distributed: parquet footers are O(KB) metadata
    // reads, classified against the canonical physical types on the
    // executors — never a driver loop over data files.
    val files = Seq("s0", "s1", "s2")
      .flatMap(s => Option(new java.io.File(s"$base/$s").listFiles)
        .getOrElse(Array.empty[java.io.File]).toSeq)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val canonPhys = Map("o_orderkey" -> "INT64", "o_custkey" -> "INT64",
      "o_totalprice" -> "DOUBLE")
    val classCounts = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val sch = try r.getFooter.getFileMetaData.getSchema
        finally r.close()
        val phys = (0 until sch.getFieldCount).map { i =>
          val fld = sch.getType(i)
          fld.getName -> fld.asPrimitiveType().getPrimitiveTypeName.name()
        }.toMap
        if (canonPhys.keys.exists(k => !phys.contains(k))) "missing_col"
        else if (phys.exists { case (n, t) =>
          canonPhys.get(n).exists(_ != t) }) "type_drift"
        else "conforming"
      }.countByValue()
    // (b) declared read-back over the whole drifted layout.
    val back = readParquetDeclared(spark, canonical,
      s"$base/s0", s"$base/s1", s"$base/s2")
    back.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("o_totalprice").isNull, 1)).as("n_null_filled"),
        sum(col("o_custkey")).as("sum_custkey"),
        (sum(graft.operators.Relational.cents(col("o_totalprice")))
          / lit(100.0)).as("sum_price_present"))
      .select(
        lit(classCounts.getOrElse("conforming", 0L)).as("n_files_conforming"),
        lit(classCounts.getOrElse("missing_col", 0L)).as("n_files_missing_col"),
        lit(classCounts.getOrElse("type_drift", 0L)).as("n_files_type_drift"),
        col("n_rows"), col("n_null_filled"), col("sum_custkey"),
        col("sum_price_present"))
  }

  /** DECLARED SCHEMA-DRIFT POSTURE for CSV sources — the same
    * null-fill / upcast / loud-fail rule as [[readParquetDeclared]],
    * restated for a format whose column resolution is POSITIONAL:
    *  - a conforming header (names match the declared schema in order)
    *    reads exactly; a malformed VALUE inside a conforming file →
    *    PERMISSIVE null (ROW-granular drift, accounted by counting
    *    nulls, same as parquet's null-fill arm);
    *  - a DRIFTED HEADER (missing / renamed / reordered column) fails
    *    LOUDLY — `enforceSchema=false` validates every file's header
    *    against the declared schema. CSV has no per-file by-name
    *    resolution, so "null-fill the missing column" is not expressible
    *    without silently shifting every later column one place left —
    *    the exact silent corruption the posture exists to prevent. A
    *    drifted CSV header is therefore parquet's "incompatible
    *    physical type" arm, not its null-fill arm;
    *  - type WIDENING does not exist in a text format: a value parses
    *    into the declared type exactly when representable, else the
    *    PERMISSIVE null arm above applies.
    * Pinned in FormatsSpec (conforming / bad-value / drifted-header
    * cases). */
  def readCsvDeclared(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** PERMISSIVE JSONL read: malformed records land whole in
    * `_corrupt_record` instead of killing the scan — the S2 posture at
    * ROW granularity (at 100 TB corrupt lines are data to account for,
    * not exceptions to die on).
    *
    * This is also the DECLARED SCHEMA-DRIFT POSTURE for JSONL: the
    * format resolves columns BY NAME per row, so parquet's file-level
    * arms reappear at row granularity —
    *  - missing key → null-filled (rows survive, accounted — the
    *    null-fill arm);
    *  - type widening does not exist (text carries no physical type):
    *    a number parses into the declared type exactly when
    *    representable — the upcast arm is the identity here;
    *  - an incompatible value (string where bigint is declared,
    *    fractional where integral) → the whole line lands in
    *    `_corrupt_record`, nulls elsewhere — LOUD IN THE DATA rather
    *    than the job, because row-granular drift at 100 TB is volume
    *    to account, not an incident to die on (file-granular parquet
    *    drift, by contrast, is a malformed TABLE and does kill the
    *    scan).
    * Pinned in FormatsSpec (missing-key / incompatible-value cases). */
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
