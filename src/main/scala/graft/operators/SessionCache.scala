package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memoization for per-(session, dir) artifacts
  * that several registry queries share — the ngram pair table, its cluster
  * labels ([[DedupOps]]), and the range-partitioned rank layout
  * ([[EventOps]]). One build per session+key; whichever consumer runs
  * first absorbs the build cost.
  *
  * Strong-keyed map + explicit eviction when the session's context ends.
  * A WeakHashMap cannot work here: the cached DataFrames hold a strong
  * reference back to their SparkSession — the key — and value→key strong
  * references defeat weak-key reclamation, so a stopped session would be
  * pinned for the process lifetime anyway. Sessions sharing one context
  * via newSession() stay cached until the context stops (acceptable: the
  * inner map is tiny — a handful of entries per scale dir).
  */
private[graft] object SessionCache {

  private val caches = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[String, Any]]()

  // ONE eviction listener per SparkContext, not per session: the
  // new-session-per-verify-run pattern (GeometrySpec pins it for the
  // twin modulus) would otherwise register a listener per session on
  // the SHARED context, all released only at application end — the
  // listener bus would grow with every session a long-lived JVM creates
  private val hooked = java.util.concurrent.ConcurrentHashMap
    .newKeySet[org.apache.spark.SparkContext]()

  private def of(s: SparkSession)
      : scala.collection.concurrent.TrieMap[String, Any] = {
    val sc = s.sparkContext
    if (hooked.add(sc))
      sc.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            val it = caches.keySet().iterator()
            while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
            hooked.remove(sc); ()
          }
        })
    caches.computeIfAbsent(s,
      _ => scala.collection.concurrent.TrieMap.empty[String, Any])
  }

  def getOrElseUpdate(s: SparkSession, key: String, build: => DataFrame)
      : DataFrame =
    memo(s, key, build)

  /** Session-scoped memo for non-DataFrame artifacts that must track the
    * session's view of a path, not the path itself — e.g. the exact-twin
    * modulus, whose DuckDB oracle re-derives from a fresh COUNT(*) every
    * run: a process-global dir-keyed memo would keep gating a STALE
    * subset after an in-JVM corpus rewrite while the oracle gates the
    * fresh one, failing the twin spuriously. Callers namespace their
    * keys (`"veccount#" + dir` style) — the map is shared — and the
    * expected value type is folded into the stored key, so a key
    * collision between two callers expecting DIFFERENT types degrades
    * to two independent entries (each built once, each well-typed)
    * instead of surfacing as a ClassCastException far from the
    * offending call site.
    */
  def memo[T](s: SparkSession, key: String, build: => T)(
      implicit ct: scala.reflect.ClassTag[T]): T =
    of(s).getOrElseUpdate(key + "⊢" + ct.runtimeClass.getName, build)
      .asInstanceOf[T]

  /** [[memo]] with an external VERSION: the entry is served only while
    * `version` matches the one it was built under; a mismatch rebuilds
    * and replaces in place (same key — [[drop]] still invalidates it).
    * This is the bounded-staleness device for memos over artifacts a
    * DIFFERENT process can mutate: key the version on the artifact's
    * commit-time metadata (the cell manifest's file status — one
    * driver-side getFileStatus per query construction, the
    * calibratedShortlistOf mtime precedent) and a cross-process append
    * becomes visible to an already-open session at its next query,
    * instead of only after newSession(). Races are benign: two threads
    * may build concurrently, last-put wins, both results are views of a
    * committed state.
    */
  def memoVersioned[T](s: SparkSession, key: String, version: String,
      build: => T)(implicit ct: scala.reflect.ClassTag[T]): T = {
    val m = of(s)
    val full = key + "⊢" + ct.runtimeClass.getName
    m.get(full) match {
      case Some((v: String, t)) if v == version => t.asInstanceOf[T]
      case _ =>
        val built = build
        m.put(full, (version, built))
        built
    }
  }

  /** Invalidate one memoized entry (same key construction as [[memo]])
    * — for memos over MUTABLE artifacts, where the mutation path owns
    * re-validation: e.g. the IVF index read's cached partition listing,
    * dropped by every index writer so the next consumer re-lists.
    * A no-op when the entry was never built.
    *
    * Dropped for EVERY session sharing the writer's SparkContext, not
    * just the writer's own: the repo's newSession()-per-verify pattern
    * means a sibling session can memoize the same artifact key, and a
    * writer-local drop would leave that sibling serving the pre-write
    * view (e.g. a pre-append index listing — appended rows silently
    * invisible within one JVM). The artifact keys carry the mutated
    * PATH, so same-key entries in sibling sessions are views of the
    * same mutable thing by construction; cross-PROCESS staleness keeps
    * the documented eventual-visibility contract.
    */
  def drop[T](s: SparkSession, key: String)(
      implicit ct: scala.reflect.ClassTag[T]): Unit = {
    val sc = s.sparkContext
    val full = key + "⊢" + ct.runtimeClass.getName
    val it = caches.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.sparkContext eq sc) e.getValue.remove(full)
    }
    ()
  }
}
