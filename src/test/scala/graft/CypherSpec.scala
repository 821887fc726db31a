package graft

import graft.cypher.CypherLite

/** Language-level parity of the Cypher front door (VERDICT r14 item 5):
  * the four reference query strings, VERBATIM, must produce plans
  * canonically equal to the oracle-green DataFrame builders — plus the
  * parser behaviors that make the translator a translator and not a
  * string lookup (parameter extraction, LIMIT propagation, whitespace
  * insensitivity, loud rejection of the unsupported). */
class CypherSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def samePlan(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean =
    a.queryExecution.optimizedPlan.sameResult(b.queryExecution.optimizedPlan)

  test("the four reference Cypher strings produce the builders' plans") {
    val cases = Seq(
      (CypherLite.Reference.productCoOccurrence, Map[String, Any]("pid" -> 1L),
        operators.Recs.coOccurrence(spark, dir, 1L)),
      (CypherLite.Reference.productSameCategory, Map[String, Any]("pid" -> 1L),
        operators.Recs.sameCategory(spark, dir, 1L)),
      (CypherLite.Reference.customerCoOccurrence, Map[String, Any]("cid" -> 1L),
        operators.Recs.customerRecs(spark, dir, 1L)),
      (CypherLite.Reference.customerSameCategory, Map[String, Any]("cid" -> 1L),
        operators.Recs.customerCategoryRecs(spark, dir, 1L)))
    for ((text, params, builder) <- cases) {
      val translated = CypherLite.query(spark, dir, text, params)
      assert(samePlan(translated, builder),
        s"plan mismatch for:\n$text")
      assert(translated.count() > 0, s"empty result for:\n$text")
    }
  }

  test("string-typed parameters work (the reference passes ids as strings)") {
    val df = CypherLite.query(spark, dir,
      CypherLite.Reference.productCoOccurrence, Map("pid" -> "1"))
    assert(samePlan(df, operators.Recs.coOccurrence(spark, dir, 1L)))
  }

  test("LIMIT propagates as the builders' k") {
    val text = CypherLite.Reference.productCoOccurrence
      .replace("LIMIT 10", "LIMIT 3")
    val df = CypherLite.query(spark, dir, text, Map("pid" -> 1L))
    assert(samePlan(df, operators.Recs.coOccurrence(spark, dir, 1L, k = 3)))
    assert(df.count() <= 3)
  }

  test("whitespace and line breaks are insignificant") {
    val oneLine = CypherLite.Reference.customerCoOccurrence
      .replaceAll("\\s+", " ")
    val df = CypherLite.query(spark, dir, oneLine, Map("cid" -> 1L))
    assert(samePlan(df, operators.Recs.customerRecs(spark, dir, 1L)))
  }

  test("a different seed parameter reaches the builder") {
    val df = CypherLite.query(spark, dir,
      CypherLite.Reference.productCoOccurrence, Map("pid" -> 3L))
    assert(samePlan(df, operators.Recs.coOccurrence(spark, dir, 3L)))
    assert(!samePlan(df, operators.Recs.coOccurrence(spark, dir, 1L)))
  }

  test("unsupported shapes fail loudly, never a silent wrong plan") {
    def rejects(text: String, params: Map[String, Any] = Map("pid" -> 1L)): Unit = {
      val e = intercept[IllegalArgumentException] {
        CypherLite.query(spark, dir, text, params)
      }
      assert(e.getMessage.startsWith("CypherLite:"), e.getMessage)
    }
    // An edge type outside the graph's schema shapes.
    rejects("""MATCH (p:Product {id: $pid})<-[:SHIPS]-(o:Order)-[:SHIPS]->(other:Product)
              |WHERE other.id <> $pid
              |RETURN other.id AS product_id, count(*) AS score
              |ORDER BY score DESC LIMIT 10""".stripMargin)
    // Q1 without its inequality guard.
    rejects("""MATCH (p:Product {id: $pid})<-[:CONTAINS]-(o:Order)-[:CONTAINS]->(other:Product)
              |RETURN other.id AS product_id, count(*) AS score
              |ORDER BY score DESC LIMIT 10""".stripMargin)
    // Missing LIMIT (the subset requires a bounded result).
    rejects("""MATCH (p:Product {id: $pid})-[:IN_CATEGORY]->(c)<-[:IN_CATEGORY]-(other:Product)
              |WHERE other.id <> $pid
              |RETURN other.id AS product_id""".stripMargin)
    // A missing parameter binding.
    rejects(CypherLite.Reference.productCoOccurrence, Map("wrong" -> 1L))
    // Garbage.
    rejects("SELECT 1")
  }
}
