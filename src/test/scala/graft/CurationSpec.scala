package graft

import graft.pipeline.Curation

class CurationSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  test("hash splits are deterministic and roughly 80/10/10") {
    val counts = Curation.splitCounts(spark, dir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.7 && counts("train") / total < 0.9)
    assert(counts("val") / total > 0.04 && counts("val") / total < 0.16)
    assert(counts("test") / total > 0.04 && counts("test") / total < 0.16)
    // pure function of the key: a rerun assigns identical splits
    assert(Curation.splitCounts(spark, dir).collect().toSeq ==
      Curation.splitCounts(spark, dir).collect().toSeq)
  }

  test("curated corpus honors the quality floor, language gate, and dedup") {
    import org.apache.spark.sql.functions.col
    val curated = Curation.curate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(curated.nonEmpty && curated.forall(_._2 >= 0.5))
    assert(curated.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // dedup keep-first: no curated doc is a non-representative duplicate
    val keeps = graft.dedup.Dedup.exact(spark, dir)
      .select(col("keep_doc_id")).collect().map(_.getLong(0)).toSet
    assert(curated.forall(c => keeps.contains(c._1)))
  }
}
