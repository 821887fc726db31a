package graft

/** Session-aware memoization for expensive per-input-dir state (cached
  * frames, GraphX views, trained index models). Keyed by the owning
  * SparkContext as well as the caller's key, so a new session in the same
  * JVM (tests after a bench run, restarted sessions) never receives state
  * bound to a stopped context — and entries owned by stopped contexts are
  * evicted on the next access, so the map cannot grow across session
  * restarts (their cached blocks already died with the context's block
  * manager; eviction just drops the dangling plan handles).
  *
  * Builds run OUTSIDE the map lock, serialized per key by an in-progress
  * latch: concurrent callers of the SAME key get one build (the losers
  * block on the winner's latch — the single-build guarantee that keeps
  * derived layouts written exactly once per JVM), while DIFFERENT keys
  * build concurrently — which is what lets audit rows and Serve's request
  * pool fan independent family builds across the executor threads instead
  * of convoying on a global monitor. A failed build removes its claim and
  * wakes waiters to retry (each retry is its own claim, so a permanent
  * failure surfaces to every caller rather than caching a broken handle).
  * A thread that re-enters get() for a key it is itself building (a
  * self-cycle) computes inline instead of deadlocking on its own latch —
  * the old getOrElseUpdate semantics.
  */
object Memo {
  /** In-progress claim: the owning thread builds; everyone else awaits
    * the latch, then reads `value` (success) or retries (`failed`). */
  private final class Building(val owner: Thread) {
    val latch = new java.util.concurrent.CountDownLatch(1)
    @volatile var value: Any = _
    @volatile var failed: Boolean = false
  }

  private val cache = scala.collection.mutable.Map
    .empty[(org.apache.spark.SparkContext, String, Any), Any]

  @annotation.tailrec
  def get[V](spark: org.apache.spark.sql.SparkSession, scope: String,
             key: Any)(build: => V): V = {
    val sc = spark.sparkContext
    if (sc.isStopped) throw new IllegalStateException(
      "Memo.get called with a stopped SparkContext")
    val k = (sc, scope, key)
    var claim: Building = null
    var await: Building = null
    var hit: Any = null
    var isHit = false
    cache.synchronized {
      cache.filterInPlace { case ((owner, _, _), _) => !owner.isStopped }
      cache.get(k) match {
        case Some(b: Building) => await = b
        case Some(v)           => hit = v; isHit = true
        case None =>
          claim = new Building(Thread.currentThread())
          cache.update(k, claim)
      }
    }
    if (isHit) hit.asInstanceOf[V]
    else if (await != null) {
      if (await.owner eq Thread.currentThread()) build // self-cycle: inline
      else {
        await.latch.await()
        if (await.failed) get(spark, scope, key)(build) // winner failed: retry
        else await.value.asInstanceOf[V]
      }
    } else {
      val v =
        try build
        catch {
          case t: Throwable =>
            cache.synchronized {
              if (cache.get(k).exists(_.asInstanceOf[AnyRef] eq claim))
                cache.remove(k)
            }
            claim.failed = true
            claim.latch.countDown()
            throw t
        }
      cache.synchronized {
        if (cache.get(k).exists(_.asInstanceOf[AnyRef] eq claim))
          cache.update(k, v)
      }
      claim.value = v
      claim.latch.countDown()
      v
    }
  }

  /** Replace (or seed) an entry — for state whose canonical value moves
    * after an in-place mutation (e.g. an index reader after an append:
    * parquet file listings snapshot per read, so the memoized handle
    * must be swapped for a fresh one to make the append visible). */
  def put[V](spark: org.apache.spark.sql.SparkSession, scope: String,
             key: Any)(value: V): V = cache.synchronized {
    cache.update((spark.sparkContext, scope, key), value)
    value
  }

  /** Live entry count (after eviction) — test observability. In-progress
    * claims count: they hold the key. */
  private[graft] def size: Int = cache.synchronized {
    cache.filterInPlace { case ((owner, _, _), _) => !owner.isStopped }
    cache.size
  }
}
