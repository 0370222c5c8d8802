package graft.llm

/** Bounded access-ordered memo for staged intermediates (checkpointed
  * DataFrames, corpus indexes). Same LRU shape as the service plan cache
  * (FlightSqlService.planCache): inserting past capacity evicts the
  * least-recently-used entry only, so a long-running multi-tenant server
  * keeps the other sessions' staged signatures warm instead of
  * clear()-ing the world. Evicted entries just recompute; dropping the
  * strong reference lets the ContextCleaner reclaim checkpoint blocks.
  */
private[llm] final class LruMemo[K, V](capacity: Int) {
  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > capacity
  }

  def getOrElseUpdate(key: K)(compute: => V): V = map.synchronized {
    val hit = map.get(key)
    if (hit != null) hit
    else { val v = compute; map.put(key, v); v }
  }

  /** Test probes. */
  private[llm] def contains(key: K): Boolean = map.synchronized(map.containsKey(key))
  private[llm] def size: Int = map.synchronized(map.size())
}
