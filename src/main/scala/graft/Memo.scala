package graft

/** Session-aware memoization for expensive per-input-dir state (cached
  * frames, GraphX views, trained index models). Keyed by the owning
  * SparkContext as well as the caller's key, so a new session in the same
  * JVM (tests after a bench run, restarted sessions) never receives state
  * bound to a stopped context.
  */
object Memo {
  private val cache =
    scala.collection.mutable.Map.empty[(Int, String, Any), Any]

  def get[V](spark: org.apache.spark.sql.SparkSession, scope: String,
             key: Any)(build: => V): V = cache.synchronized {
    // Drop entries from dead contexts so the map cannot grow across
    // session restarts.
    val sc = spark.sparkContext
    if (sc.isStopped) throw new IllegalStateException(
      "Memo.get called with a stopped SparkContext")
    val k = (System.identityHashCode(sc), scope, key)
    cache.getOrElseUpdate(k, build).asInstanceOf[V]
  }
}
