package graft

/** Contract guards on the driver-facing registry itself. */
class RegistrySpec extends SparkTestBase {

  test("module registries never collide on a query name") {
    // Registry.++ is Map ++: a duplicate key would silently shadow one
    // module's query with another's — this guard turns that into a
    // loud failure at the moment the collision is introduced.
    val modules = Seq(
      operators.RecsRegistry.registry,
      operators.RelationalRegistry.registry,
      graph.GraphRegistry.registry,
      text.TextRegistry.registry,
      dedup.DedupRegistry.registry,
      similarity.SimilarityRegistry.registry,
      streaming.StreamingRegistry.registry,
      multimodal.MultimodalRegistry.registry,
      sources.SourcesRegistry.registry,
      pipeline.CurationRegistry.registry)
    assert(modules.map(_.queries.size).sum == SparkEntry.queries.size)
    assert(modules.map(_.oracles.size).sum == SparkEntry.oracleSql.size)
  }

  test("every oracle has a query, and every oracle name is a query name") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("the flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("graph_node_props oracle adapts to the fixture's customer schema") {
    // Seed fixture HAS c_join_date → the oracle must project it; the
    // driver's testdata does not → the static fallback keeps NULL.
    val withCol = graph.GraphRegistry
      .adaptiveOracles(spark, SeedFixture.dir)("graph_node_props")
    assert(withCol.contains("c_join_date AS DATE"))
    val without = graph.GraphRegistry
      .adaptiveOracles(spark, "/root/testdata/sf0.001")("graph_node_props")
    assert(!without.contains("c_join_date"))
    assert(without == SparkEntry.oracleSql("graph_node_props"))
  }
}
