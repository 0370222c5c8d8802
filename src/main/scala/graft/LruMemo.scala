package graft

/** Bounded access-ordered memo for staged intermediates (checkpointed
  * DataFrames, corpus indexes). Same LRU shape as the service plan cache
  * (FlightSqlService.planCache): inserting past capacity evicts the
  * least-recently-used entry only, so a long-running multi-tenant server
  * keeps the other sessions' staged signatures warm instead of
  * clear()-ing the world. Evicted entries just recompute; dropping the
  * strong reference lets the ContextCleaner reclaim checkpoint blocks.
  *
  * The map lock guards only map operations: each entry is a lazy cell,
  * so a multi-second staging compute blocks ONLY callers of its own key
  * (they share the cell's result), never other keys — one tenant's
  * cold-start must not serialize every other tenant's lookup.
  */
private[graft] final class LruMemo[K, V](capacity: Int) {
  private final class Cell(compute: () => V) { lazy val value: V = compute() }

  private val map = new java.util.LinkedHashMap[K, Cell](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Cell]): Boolean =
      size() > capacity
  }

  def getOrElseUpdate(key: K)(compute: => V): V = {
    val cell = map.synchronized {
      val hit = map.get(key)
      if (hit != null) hit
      else { val c = new Cell(() => compute); map.put(key, c); c }
    }
    cell.value // first caller computes outside the map lock
  }

  /** Drop a key (e.g. a memoized computation that turned out broken, so
    * the next caller retries instead of sharing the cached failure).
    */
  def remove(key: K): Unit = map.synchronized { map.remove(key); () }

  /** Test probes. */
  private[graft] def contains(key: K): Boolean = map.synchronized(map.containsKey(key))
  private[graft] def size: Int = map.synchronized(map.size())

  /** Count of entries whose (computed) value satisfies p — forces the
    * snapshot's cells OUTSIDE the map lock, like any reader.
    */
  private[graft] def countValues(p: V => Boolean): Int = {
    val cells = map.synchronized(new java.util.ArrayList(map.values()))
    var n = 0
    cells.forEach(c => if (p(c.value)) n += 1)
    n
  }
}
