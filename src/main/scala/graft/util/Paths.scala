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

  /** Cheap content fingerprint of a corpus directory for cache-keying
    * session-persisted derived tables (bucketed fact pairs, ANN
    * indexes): md5 over the sorted (relative path, size) list of every
    * file under `dir` whose top-level entry starts with one of
    * `tables`. Pure filesystem METADATA — no data read — so it costs
    * microseconds, but any regeneration of the source parquet (new
    * part files, different sizes) changes the key and forces a rebuild
    * instead of silently serving stale derived data. (Same-size
    * in-place byte edits escape it; the corpus contract is
    * immutable-files-within-a-session, and this catches the realistic
    * violation — a re-generated directory.)
    */
  def corpusFingerprint(dir: String, tables: Seq[String]): String = {
    val root = java.nio.file.Paths.get(dir)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    tables.foreach { t =>
      val p = root.resolve(s"$t.parquet")
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.forEach { f =>
          if (Files.isRegularFile(f))
            entries += s"${root.relativize(f)}:${Files.size(f)}"
        } finally walk.close()
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(dir.getBytes("UTF-8"))
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().take(6).map("%02x".format(_)).mkString
  }
}
