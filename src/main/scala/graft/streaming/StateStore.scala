package graft.streaming

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** Crash-safe commits for parquet-backed sink state.
  *
  * Every state rewrite lands in a FRESH version directory (`v-<name>-<id>`)
  * beside the live one; the swap is a single `MANIFEST` pointer file
  * replaced via atomic rename. A crash at any point leaves either the old
  * manifest (old state fully intact, new dirs are invisible orphans) or the
  * new manifest (whose dirs were fully written before the flip) — never a
  * state directory that is half old, half new, which the previous
  * overwrite-in-place swap could produce. Orphans are swept on the next
  * successful commit.
  *
  * The manifest also carries scalar entries (the incremental aggregate's
  * high-water mark), so "new data + new watermark" is ONE atomic flip — a
  * crash can no longer publish merged data with a stale watermark, which
  * under replay would double-apply a batch.
  *
  * Scale note: this is the same commit shape as a transactional table
  * format's metadata pointer (snapshot files + one atomic pointer swap);
  * on a production object store the rename becomes the store's
  * put-if-absent/pointer CAS while every caller here stays unchanged.
  */
object StateStore {

  private val ManifestName = "MANIFEST"
  private val VersionPrefix = "v-"

  /** Test hook: simulate a crash after state files are written but before
    * the manifest flip (the window the protocol must make safe). */
  @volatile private[streaming] var failBeforeCommit: Boolean = false

  /** Current manifest entries; empty map if no state was ever committed. */
  def load(root: String): Map[String, String] = {
    val f = new File(root, ManifestName)
    if (!f.exists()) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.contains('=')).map { l =>
        val i = l.indexOf('=')
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap
      finally src.close()
    }
  }

  /** Atomically publish `entries` as the new manifest, then sweep every
    * version directory the new manifest no longer references (previous
    * versions and crash orphans). */
  def commit(root: String, entries: Map[String, String]): Unit = {
    val rootF = new File(root)
    rootF.mkdirs()
    if (failBeforeCommit)
      throw new IllegalStateException("injected crash before manifest commit")
    val tmp = Files.createTempFile(rootF.toPath, ".manifest", ".tmp")
    val body = entries.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
    Files.writeString(tmp, body)
    Files.move(tmp, rootF.toPath.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val live = entries.values.toSet
    Option(rootF.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(VersionPrefix))
      .filterNot(d => live.contains(d.getName))
      .foreach(deleteRecursively)
  }

  /** Fresh (never-reused) version directory name for a logical state name. */
  def newVersion(name: String): String =
    s"$VersionPrefix$name-${java.util.UUID.randomUUID().toString.take(12)}"

  private[streaming] def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
