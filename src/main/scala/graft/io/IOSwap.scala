package graft.io

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Staging-and-swap helper for append-mode file sinks: Spark reads the
  * existing output lazily while writing its replacement, so an in-place
  * overwrite would truncate its own input. Appends therefore write the
  * union to `<path>.__staging` and swap directories afterwards. */
private[io] object IOSwap {

  /** JVM-wide per-path monitors serializing the recover+swap critical
    * sections (r21, the r20 ADVICE race): exists() self-heals by moving
    * `.__old` back when it sees the crash signature, but a concurrent
    * healthy writeSwapped passes through EXACTLY that signature between
    * its two renames — an unsynchronized exists() could "recover" a
    * live swap and make the writer's second rename throw with stale
    * data left at `path`. Both entry points now hold the path's monitor,
    * so the signature is only ever observed when no same-path writer is
    * mid-swap (i.e. after a genuine crash). writeSwapped holds the lock
    * across its whole staged branch, which also serializes concurrent
    * same-path appends (they would otherwise clobber each other's
    * staging directories); the write callback never re-enters IOSwap on
    * another path, so lock ordering is flat and cycle-free. The map is
    * keyed on the normalized absolute path and never evicts — one small
    * monitor per distinct append target for the JVM's life, the same
    * order of growth as ParquetIO's schema cache. */
  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    pathLocks.computeIfAbsent(
      Paths.get(path).toAbsolutePath.normalize.toString, _ => new Object)

  def exists(path: String): Boolean = lockFor(path).synchronized {
    recoverCrashedSwap(path)
    Files.exists(Paths.get(path))
  }

  /** Self-heal the one non-atomic window writeSwapped leaves open: a JVM
    * death between "move path aside to .__old" and "move .__staging in"
    * strands the ONLY copy of the data under `.__old` with `path` absent.
    * Without this, the next append run sees exists(path)=false, writes
    * fresh, and its writeSwapped preamble deletes `.__old` — silently
    * discarding the previous output. Restoring `.__old` to `path` first
    * turns that into a normal append over the recovered data.
    *
    * The recover condition is the EXACT crash-window signature — path
    * absent AND `.__old` present AND `.__staging` present (the staged
    * write completed before any rename, so a mid-swap crash always
    * leaves all of staging+old) — not merely "path absent + old
    * present". The looser test would RESURRECT superseded data: a crash
    * in the post-swap cleanup window leaves a stale `.__old` next to a
    * live `path`, and if `path` is later removed by anything else (an
    * out-of-band delete, an interrupted non-append overwrite), restoring
    * that stale copy would silently revive rows the successful swap had
    * already replaced. In that ambiguous state the stale `.__old` stays
    * deletable and the next write starts fresh, as before the fix. */
  private[io] def recoverCrashedSwap(path: String): Unit = {
    val p = Paths.get(path)
    val old = Paths.get(path + ".__old")
    val staging = Paths.get(path + ".__staging")
    if (!Files.exists(p) && Files.exists(old) && Files.exists(staging))
      Files.move(old, p)
  }

  private[io] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p) // close the stream: it holds directory fds
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.deleteIfExists(_))
      finally walk.close()
    }

  /** Sorted part-file paths of a Spark output directory; the listing
    * stream is closed before returning. */
  private[io] def partFiles(dir: String): Seq[Path] = {
    val ls = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("part-")).sorted
    } finally ls.close()
  }

  /** Run `write` against the real path, or a staging path when the
    * target must stay readable during the write; then swap.
    *
    * Swap order matters for crash robustness: the old directory is
    * RENAMED aside (one atomic rename) before the staging dir is
    * renamed in, then the old copy is deleted last. A delete-then-move
    * shape would leave NO output at `path` at all if the JVM dies
    * between the two steps (OOM, preemption); with rename-rename the
    * exposure shrinks to a single rename's window, and every interim
    * state keeps the data recoverable under `.__old` / `.__staging`. */
  def writeSwapped(path: String, viaStaging: Boolean)(write: String => Unit): Unit =
    if (!viaStaging) write(path)
    else lockFor(path).synchronized {
      recoverCrashedSwap(path) // belt-and-braces: exists() already heals,
      // but a direct caller must not reach the deleteRecursively(old)
      // below while `.__old` holds the only copy
      val staging = path + ".__staging"
      val old = path + ".__old"
      deleteRecursively(Paths.get(staging))
      deleteRecursively(Paths.get(old))
      write(staging)
      Files.move(Paths.get(path), Paths.get(old))
      Files.move(Paths.get(staging), Paths.get(path))
      deleteRecursively(Paths.get(old))
    }
}
