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
