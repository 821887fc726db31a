package graft

/** Session-aware memoization for expensive per-input-dir state (cached
  * frames, GraphX views, trained index models). Keyed by the owning
  * SparkContext as well as the caller's key, so a new session in the same
  * JVM (tests after a bench run, restarted sessions) never receives state
  * bound to a stopped context — and entries owned by stopped contexts are
  * evicted on the next access, so the map cannot grow across session
  * restarts (their cached blocks already died with the context's block
  * manager; eviction just drops the dangling plan handles).
  */
object Memo {
  private val cache = scala.collection.mutable.Map
    .empty[(org.apache.spark.SparkContext, String, Any), Any]

  def get[V](spark: org.apache.spark.sql.SparkSession, scope: String,
             key: Any)(build: => V): V = cache.synchronized {
    val sc = spark.sparkContext
    if (sc.isStopped) throw new IllegalStateException(
      "Memo.get called with a stopped SparkContext")
    cache.filterInPlace { case ((owner, _, _), _) => !owner.isStopped }
    cache.getOrElseUpdate((sc, scope, key), build).asInstanceOf[V]
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

  /** Live entry count (after eviction) — test observability. */
  private[graft] def size: Int = cache.synchronized {
    cache.filterInPlace { case ((owner, _, _), _) => !owner.isStopped }
    cache.size
  }
}
