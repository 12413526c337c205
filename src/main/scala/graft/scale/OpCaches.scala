package graft.scale

import org.apache.spark.sql.DataFrame

/**
 * Registry for operator-INTERNAL persist handles (Dedup/Similarity persist
 * small derived tables — signatures, fingerprints, posting lists — that are
 * consumed several times within one returned plan). The graph layer's
 * cache-ownership rule (RelationalOps.split scaladoc) says whoever persists
 * must release; these operators return lazy DataFrames, so they cannot
 * unpersist themselves — instead every internal persist is registered here
 * and the OWNER releases it.
 *
 * Ownership has two regimes:
 *  - SCOPED (JobGraph.build wraps its fold in [[scoped]]): every persist
 *    the operators register while THIS thread constructs a job lands in
 *    that job's own handle list, which BuiltJob.close() releases. This is
 *    what makes release safe under concurrency — before r20, close()
 *    drained a global queue and could unpersist a concurrently-running
 *    job's signature table mid-run, silently re-materializing its
 *    upstream DAG (correctness-neutral, but exactly the repeated-scan
 *    cost the persist existed to avoid).
 *  - GLOBAL (no scope active — direct API callers, Verify's per-query
 *    loop, tests): handles queue globally and [[drain]] releases the
 *    backlog; Bench relies on `spark.catalog.clearCache()`.
 *
 * Unpersisting a DataFrame another query still references is
 * correctness-neutral in Spark (the data is recomputed on next use) — so
 * even a mis-scoped release can at worst recompute, never break. Entries
 * are released FIFO with blocking=false.
 */
object OpCaches {
  private val cached = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  // operator persists happen while the build thread CONSTRUCTS plans, so
  // a ThreadLocal scope captures exactly one job's handles; actions that
  // run later (runSinks) only consume already-built plans
  private val scope = new ThreadLocal[java.util.ArrayList[DataFrame]]()

  /** Persist `df` and register the handle with the active scope (or the
    * global queue when no scope is active). */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val h = df.persist()
    val s = scope.get()
    if (s ne null) s.add(h) else cached.add(h)
    h
  }

  /** Run `f` with a fresh handle scope on this thread; returns (result,
    * the operator persists registered during `f`) — the caller owns their
    * release. On throw the scope's handles are released here, so a build
    * that dies halfway leaks nothing. Scopes nest (the previous scope is
    * restored either way). */
  private[graft] def scoped[A](f: => A): (A, Seq[DataFrame]) = {
    val prev = scope.get()
    val s = new java.util.ArrayList[DataFrame]()
    scope.set(s)
    try {
      val a = f
      import scala.jdk.CollectionConverters._
      (a, s.asScala.toList)
    } catch {
      case t: Throwable =>
        import scala.jdk.CollectionConverters._
        s.asScala.foreach(_.unpersist(false))
        throw t
    } finally scope.set(prev)
  }

  /** Number of globally registered, not-yet-drained handles
    * (diagnostics/tests; scoped handles are their owner's). */
  def pending: Int = cached.size()

  /** Unpersist every GLOBALLY registered operator-internal cache (no-op
    * on scoped handles — their owning BuiltJob releases them). */
  def drain(): Unit = {
    var d = cached.poll()
    while (d != null) {
      d.unpersist(false)
      d = cached.poll()
    }
  }
}
