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
}
