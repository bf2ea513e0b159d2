package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Small filesystem helpers for scratch/checkpoint directories. */
object Paths {

  /** Delete a directory tree (children first). Swallows nothing: a
    * locked file surfaces as the usual IOException, which is the right
    * failure for leaked scratch space.
    */
  def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
}
