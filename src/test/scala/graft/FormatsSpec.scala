package graft

import graft.sources.Formats

class FormatsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("missing source paths degrade to empty typed frames (S2 posture)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))
    val csv = Formats.readCsv(spark, "/tmp/does-not-exist-csv", schema)
    val jsonl = Formats.readJsonl(spark, "/tmp/does-not-exist-jsonl", schema)
    assert(csv.isEmpty && csv.schema == schema)
    assert(jsonl.isEmpty && jsonl.schema == schema)
  }

  test("PERMISSIVE JSONL: corrupt rows are accounted, never fatal, never leaking values") {
    import org.apache.spark.sql.functions._
    val row = sources.Formats.tolerantJsonlCounts(spark, dir).head()
    val nEvents = Tables.load(spark, dir, "events").count()
    val nCorrupt = Tables.load(spark, dir, "events")
      .filter(col("event_id") % 97 === 0).count()
    assert(row.getLong(0) == nEvents)              // every line is a row
    assert(row.getLong(1) == nCorrupt && nCorrupt > 0)
    assert(row.getLong(2) == nEvents - nCorrupt)   // good = total - corrupt
    // Corrupt rows contribute NOTHING to the value sum.
    val goodSum = Tables.load(spark, dir, "events")
      .filter(col("event_id") % 97 =!= 0)
      .agg((sum(graft.operators.Relational.cents(col("value"))) / lit(100.0)))
      .head().getDouble(0)
    assert(row.getDouble(3) == goodSum)
  }

  test("CSV and JSONL round-trip the events rows exactly") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    val base = java.nio.file.Files.createTempDirectory("graft-fmt-spec")
      .toString
    ev.write.option("header", "true").csv(s"$base/csv")
    ev.write.json(s"$base/jsonl")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    val orig = rows(ev)
    assert(rows(Formats.readCsv(spark, s"$base/csv", ev.schema)) == orig)
    assert(rows(Formats.readJsonl(spark, s"$base/jsonl", ev.schema)) == orig)
    assert(orig.nonEmpty)
  }

  test("declared schema-drift posture: null-fill, widen, reject — all three arms") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-drift-spec")
      .toString
    val canonical = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    Seq((1L, 1.5), (2L, 2.5)).toDF("k", "v")
      .write.parquet(s"$base/canon")
    Seq(3L, 4L).toDF("k").write.parquet(s"$base/missing")
    Seq((5, 5.5)).toDF("k", "v")
      .withColumn("k", org.apache.spark.sql.functions.col("k").cast("int"))
      .write.parquet(s"$base/narrow")
    Seq(("6", 6.5)).toDF("k", "v").write.parquet(s"$base/bad")
    // Arms 1+2: missing column null-fills, int32 widens exactly.
    val ok = Formats.readParquetDeclared(spark, canonical,
        s"$base/canon", s"$base/missing", s"$base/narrow")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(ok == Set(1L -> Some(1.5), 2L -> Some(2.5), 3L -> None,
      4L -> None, 5L -> Some(5.5)))
    // Arm 3: an incompatible physical type fails LOUDLY at the scan.
    val e = intercept[Exception] {
      Formats.readParquetDeclared(spark, canonical,
        s"$base/canon", s"$base/bad").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("FAILED_READ_FILE") ||
      m.contains("PARQUET_COLUMN_DATA_TYPE_MISMATCH") ||
      m.contains("SchemaColumnConvertNotSupported")),
      s"expected a loud parquet type-mismatch failure, got: $e")
  }

  test("schema-drift report accounts files, null-fills and exact sums at sf0.001") {
    val r = Formats.schemaDriftReport(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
    val orders = Tables.load(spark, dir, "orders")
    assert(r.getLong(3) == orders.count())
    import org.apache.spark.sql.functions._
    val expNull = orders.filter(col("o_orderkey") % 3 === 1).count()
    assert(r.getLong(4) == expNull && expNull > 0)
  }
}
