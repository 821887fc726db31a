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
}
