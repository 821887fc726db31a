package graft

import graft.dedup.Dedup
import graft.similarity.Similarity

/** Cache-lifecycle properties: repeated operator invocations in one
  * long-lived session must share ONE persisted plan per (session, dir)
  * input — the storage tab must not grow with call count. (Eviction of
  * stopped-context entries is exercised implicitly: Memo filters dead
  * owners on every access; a second context cannot be started in this
  * JVM to observe it directly.)
  */
class MemoSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("memoized builders return the identical frame instance") {
    assert(Dedup.shingles(spark, dir) eq Dedup.shingles(spark, dir))
    assert(Dedup.minhashSignatures(spark, dir) eq
      Dedup.minhashSignatures(spark, dir))
    assert(Dedup.simhashes(spark, dir) eq Dedup.simhashes(spark, dir))
  }

  test("repeated query invocations do not grow the persisted-RDD tab") {
    def persisted = spark.sparkContext.getPersistentRDDs.size
    Dedup.minhashLshPairs(spark, dir).collect()
    Similarity.srpLshPairs(spark, dir).collect()
    val after1 = persisted
    val entries1 = Memo.size
    Dedup.minhashLshPairs(spark, dir).collect()
    Similarity.srpLshPairs(spark, dir).collect()
    Dedup.simhashPairs(spark, dir).collect()
    Dedup.simhashPairs(spark, dir).collect()
    assert(persisted <= after1 + 1) // +1: simhashes' first materialization
    assert(Memo.size <= entries1 + 1)
  }

  test("Memo.put replaces the entry; later gets see the new value") {
    val k = "memo-put-test"
    assert(Memo.get(spark, k, 1)("v1") == "v1")
    assert(Memo.put(spark, k, 1)("v2") == "v2")
    // get must return the swapped value, not rebuild or resurrect v1.
    assert(Memo.get[String](spark, k, 1)(fail("must not rebuild")) == "v2")
  }

  test("layout checkpoint leaves the caller's session conf untouched") {
    // The AQE-off planning happens in a CLONED session (SessionShim);
    // the caller's conf must read enabled before, during-adjacent, and
    // after — the Serve-concurrency guarantee of the advice fix.
    import spark.implicits._
    val key = "spark.sql.adaptive.enabled"
    assert(spark.conf.get(key) == "true")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(2, org.apache.spark.sql.functions.col("id"))
    val ck = Layout.checkpoint(df)
    assert(spark.conf.get(key) == "true")
    // The checkpoint is usable from the caller's session and keeps rows.
    assert(ck.sparkSession eq spark)
    assert(ck.count() == 2)
  }
}
