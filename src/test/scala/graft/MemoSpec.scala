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

  test("concurrent gets of one key build once; losers get the winner's value") {
    val n = 16
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (1 to n).map { _ =>
        Future {
          start.await()
          Memo.get(spark, "memo-race-one-key", 42) {
            builds.incrementAndGet()
            Thread.sleep(100) // widen the race window
            "built"
          }
        }
      }
      start.countDown()
      val got = Await.result(Future.sequence(fs), Duration(30, "sec"))
      assert(got.forall(_ == "built"))
      assert(builds.get() == 1,
        s"single-build guarantee violated: ${builds.get()} builds")
    } finally pool.shutdown()
  }

  test("distinct keys build concurrently, not convoyed on a global lock") {
    // Two builds that each BLOCK until the other has started can only
    // both finish if Memo runs them outside a shared monitor — the
    // property convergence_audit's parallel family probes rely on.
    val bothStarted = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      def build(id: Int) = Future {
        Memo.get(spark, "memo-concurrent-keys", id) {
          // 10s bound: under the old global-monitor Memo this await can
          // never be satisfied (the second build cannot enter), and the
          // broken-barrier exception fails the test instead of hanging it.
          bothStarted.await(10, java.util.concurrent.TimeUnit.SECONDS)
          id
        }
      }
      val got = Await.result(
        Future.sequence(Seq(build(1), build(2))), Duration(30, "sec"))
      assert(got.toSet == Set(1, 2))
    } finally pool.shutdown()
  }

  test("a failed build is not cached; waiters and retries rebuild") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = "memo-failed-build"
    intercept[RuntimeException] {
      Memo.get[String](spark, key, 1) {
        attempts.incrementAndGet(); throw new RuntimeException("boom")
      }
    }
    // The failure must not be cached: the next get builds again.
    assert(Memo.get(spark, key, 1) {
      attempts.incrementAndGet(); "ok"
    } == "ok")
    assert(attempts.get() == 2)
    assert(Memo.get[String](spark, key, 1)(fail("must not rebuild")) == "ok")
  }

  test("self-reentrant get of the key under construction computes inline") {
    val key = "memo-reentrant"
    val got = Memo.get(spark, key, 1) {
      // The outer build consults the same key (a self-cycle): inline
      // compute, no self-deadlock on the in-progress latch.
      Memo.get(spark, key, 1)("inner")
    }
    assert(got == "inner")
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
