package graft.ops

/** Bounded LRU memo shared by the iterative trainers (k-means, BPE).
  *
  * Concurrency: the global lock covers only map get/put — the compute runs
  * under the CELL's lazy-val monitor, so two sessions training on
  * DIFFERENT keys proceed in parallel while same-key callers share one
  * run (the r5 computeIfAbsent semantics, without serializing unrelated
  * trainings behind one monitor).
  *
  * Eviction: LRU past `cap`; `onEvict` fires only for values that were
  * actually computed (an abandoned never-forced cell has nothing to
  * release). */
private[graft] final class BoundedMemo[K, V](cap: Int)(onEvict: V => Unit) {

  private final class Cell(compute: () => V) {
    @volatile var computed = false
    lazy val value: V = { val v = compute(); computed = true; v }
  }

  private val map = new java.util.LinkedHashMap[K, Cell](cap, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Cell]): Boolean =
      if (size > cap) {
        val c = e.getValue
        if (c.computed) { try onEvict(c.value) catch { case _: Throwable => () } }
        true
      } else false
  }

  /** True iff `key` holds an already-computed value (refreshes LRU order).
    * Used by fused trainers to find which sub-problems still need work. */
  def contains(key: K): Boolean = map.synchronized {
    val c = map.get(key); c != null && c.computed
  }

  def getOrCompute(key: K, f: => V): V = {
    val cell = map.synchronized {
      val got = map.get(key)
      if (got != null) got
      else { val fresh = new Cell(() => f); map.put(key, fresh); fresh }
    }
    cell.value
  }

  def size: Int = map.synchronized(map.size)
}
