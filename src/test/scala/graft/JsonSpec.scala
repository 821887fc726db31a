package graft

import graft.operators.{Json, Recs}

class JsonSpec extends SparkTestBase {

  test("props extraction parses every seed event's k, malformed yields null") {
    import spark.implicits._
    val byType = Json.propsExtract(spark, SeedFixture.dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byType("view") == ((3L, 3L)))
    assert(byType("click") == ((1L, 1L)))
    assert(byType("add_to_cart") == ((1L, 1L)))
    // malformed props documents count as events but not as extracted ks
    val bad = Seq((1L, "not json"), (2L, """{"k": 7}"""))
      .toDF("event_id", "props")
      .withColumn("p", org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("props"), Json.propsSchema))
    assert(bad.filter("p.k IS NOT NULL").count() == 1)
  }

  test("items-JSON shim renders the reference's wire shape from a top-k plan") {
    val json = Json.toItemsJson(Recs.coOccurrence(spark, SeedFixture.dir, 2L))
    assert(json.startsWith("{\"items\": ["))
    assert(json.contains("\"product_id\":1") && json.contains("\"product_id\":4"))
    assert(json.contains("\"reason\":\"co-occurrence\""))
  }
}
