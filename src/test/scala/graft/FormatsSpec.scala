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
  test("CSV drift posture: conforming header exact, bad value nulls, drifted header fails loudly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-csv-drift")
      .toString
    val declared = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    // conforming file, with one malformed VALUE in the numeric column
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/good.csv"),
      "k,name,v\n1,a,1.5\n2,b,oops\n3,c,3.5\n".getBytes("UTF-8"))
    val good = Formats.readCsvDeclared(spark, s"$base/good.csv", declared)
    val rows = good.orderBy("k").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(2), "malformed value must null, not fail")
    assert(rows(0).getDouble(2) == 1.5 && rows(2).getDouble(2) == 3.5)
    // drifted header: the middle column vanished upstream - positional
    // resolution would silently read v into name; the declared read
    // must fail LOUDLY instead.
    val driftDir = s"$base/drift"
    new java.io.File(driftDir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$driftDir/d.csv"),
      "k,v\n1,1.5\n".getBytes("UTF-8"))
    val e = intercept[Throwable] {
      Formats.readCsvDeclared(spark, driftDir, declared).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(m =>
        m.contains("header") || m.contains("Header") ||
          m.contains("CSV"))), s"unexpected failure: $e")
  }

  test("JSONL drift posture: missing key null-fills, incompatible value goes corrupt") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-jsonl-drift")
      .toString
    val declared = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/d.jsonl"),
      ("""{"k":1,"name":"a","v":1.5}""" + "\n" +
       """{"k":2,"v":2.5}""" + "\n" +            // name vanished upstream
       """{"k":"oops","name":"c","v":3.5}""" + "\n") // string where bigint
        .getBytes("UTF-8"))
    val read = Formats.readJsonlTolerant(spark, s"$base/d.jsonl", declared)
      .collect()
    assert(read.length == 3)
    val conforming = read.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    assert(conforming.getString(1) == "a" && conforming.getDouble(2) == 1.5 &&
      conforming.isNullAt(3))
    // missing key -> null-filled, row SURVIVES, not corrupt
    val nullFilled = read.find(r => !r.isNullAt(0) && r.getLong(0) == 2L).get
    assert(nullFilled.isNullAt(1) && nullFilled.getDouble(2) == 2.5 &&
      nullFilled.isNullAt(3))
    // incompatible value -> whole line accounted in _corrupt_record
    val corrupt = read.find(r => !r.isNullAt(3)).get
    assert(corrupt.isNullAt(0) && corrupt.getString(3).contains("oops"))
  }
}
