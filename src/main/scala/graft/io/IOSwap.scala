package graft.io

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Staging-and-swap helper for append-mode file sinks: Spark reads the
  * existing output lazily while writing its replacement, so an in-place
  * overwrite would truncate its own input. Appends therefore write the
  * union to `<path>.__staging` and swap directories afterwards. */
private[io] object IOSwap {

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(Files.deleteIfExists(_))
    }

  /** Run `write` against the real path, or a staging path when the
    * target must stay readable during the write; then swap. */
  def writeSwapped(path: String, viaStaging: Boolean)(write: String => Unit): Unit =
    if (!viaStaging) write(path)
    else {
      val staging = path + ".__staging"
      deleteRecursively(Paths.get(staging))
      write(staging)
      deleteRecursively(Paths.get(path))
      Files.move(Paths.get(staging), Paths.get(path))
    }
}
