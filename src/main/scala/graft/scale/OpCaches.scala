package graft.scale

import org.apache.spark.sql.DataFrame

/**
 * Registry for operator-INTERNAL persist handles (Dedup/Similarity persist
 * small derived tables — signatures, fingerprints, posting lists — that are
 * consumed several times within one returned plan). The graph layer's
 * cache-ownership rule (RelationalOps.split scaladoc) says whoever persists
 * must release; these operators return lazy DataFrames, so they cannot
 * unpersist themselves — instead every internal persist is registered here
 * and `drain()` releases the backlog.
 *
 * Callers with a bounded lifetime (Bench, tests) may rely on
 * `spark.catalog.clearCache()`; long-lived processes (Scheduler,
 * ControlPlane) get a `drain()` from `BuiltJob.close()` after each job run,
 * so cached signature tables no longer accumulate for the life of the JVM.
 *
 * `drain()` is deliberately global: unpersisting a DataFrame another query
 * still references is correctness-neutral in Spark (the data is recomputed
 * on next use), so a concurrent job can at worst recompute — it cannot
 * break. Entries are released FIFO with blocking=false.
 */
object OpCaches {
  private val cached = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register the handle for the next drain. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    val h = df.persist()
    cached.add(h)
    h
  }

  /** Number of registered, not-yet-drained handles (diagnostics/tests). */
  def pending: Int = cached.size()

  /** Unpersist every registered operator-internal cache. */
  def drain(): Unit = {
    var d = cached.poll()
    while (d != null) {
      d.unpersist(false)
      d = cached.poll()
    }
  }
}
